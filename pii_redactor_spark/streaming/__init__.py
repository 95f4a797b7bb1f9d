from .scrub_stream import scrub_file_stream, start_scrub_stream  # noqa: F401
