"""End-to-end jobs: the resumable quality-filter + scrub pipeline."""
