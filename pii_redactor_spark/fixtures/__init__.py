"""Deterministic synthetic fixtures: the image+caption table and its oracle.

Everything is seeded per row key (``image_id``) — never from partition order —
so generation is byte-identical at any parallelism (SURVEY.md §7 hard-part 2).
"""
