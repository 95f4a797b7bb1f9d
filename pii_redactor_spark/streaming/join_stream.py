"""Streaming join shapes: stream-static enrichment and stream-stream joins.

Two production patterns a continuously-ingested image+caption corpus needs
that the stateless scrub stream (``scrub_stream.py``) doesn't cover:

* **Stream-static broadcast enrichment** — per-language policy rows, a
  toxicity lexicon, or any slowly-changing dimension joined onto the
  stream.  Spark re-executes the static side's plan per micro-batch, but
  for a parquet-backed frame the FILE LISTING is resolved once at
  DataFrame creation — new dim files are NOT picked up, and overwriting
  them can fail the stream mid-run.  To refresh the dimension, rebuild
  the dim DataFrame and restart the query (or re-read it per batch
  inside foreachBatch; snapshot-aware sources like the storage module's
  manifest reader make that cheap).  The broadcast hint keeps the join
  shuffle-free: each task holds the dim in memory, the unbounded stream
  side never moves.  At 10^12 rows that is the only viable shape —
  shuffling the stream side on a dim key would re-partition the firehose
  every trigger.

* **Watermarked stream-stream equi-join** — two event streams (e.g. the
  caption-scrub decisions and a separately-ingested image-quality feed)
  joined on image_id within a bounded event-time skew.  Both sides are
  watermarked and the join condition carries an event-time range, so
  Spark's symmetric hash join can evict buffered state once the watermark
  passes ``max_delay`` — bounded memory regardless of stream length.
  Without the range condition the state store grows without bound; this
  module makes the bound mandatory.

The reference is batch-only (SURVEY.md §2.10); these are engine additions
in the same spirit as the rest of ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Join a streaming frame to a static dimension, broadcast.

    ``dim_df`` must be a batch (non-streaming) DataFrame.  Its plan is
    re-executed per micro-batch, but a parquet-backed dim pins its file
    listing at creation — to pick up a refreshed dimension, rebuild the
    DataFrame and restart the query (see module docstring).  The
    broadcast hint pins the shuffle-free plan — the stream side is never
    repartitioned.
    """
    if dim_df.isStreaming:
        raise ValueError("dim_df must be a static DataFrame")
    return stream_df.join(F.broadcast(dim_df), on, how)


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "image_id",
    left_time: str = "ts",
    right_time: str = "ts",
    max_delay: str = "10 minutes",
) -> DataFrame:
    """Inner-join two event streams on ``key`` within ``max_delay`` skew.

    Both sides are watermarked at ``max_delay`` and the join condition
    bounds ``right_time`` to ``left_time ± max_delay``, which is exactly
    what lets Spark clean up buffered rows: state for an event is dropped
    once the other side's watermark guarantees no in-range match can still
    arrive.  Right-side columns are prefixed ``r_`` to keep both event
    times addressable in the output.
    """
    lw = left.withWatermark(left_time, max_delay)
    rw = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark(f"r_{right_time}", max_delay)
    delay = F.expr(f"INTERVAL {max_delay}")
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_time}") >= F.col(left_time) - delay)
        & (F.col(f"r_{right_time}") <= F.col(left_time) + delay)
    )
    return lw.join(rw, cond, "inner")
