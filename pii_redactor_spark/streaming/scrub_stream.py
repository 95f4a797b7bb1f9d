"""Structured Streaming form of the scrub pipeline.

The reference is strictly batch (SURVEY.md §2.10) and the north rule's
"resumable from checkpoint" is satisfied by the batch lineage protocol in
``pipeline/run.py`` — but a continuously-ingested image+caption corpus is the
natural production shape at 10^12 rows, so the engine also exposes the scrub
stage as a streaming transform:

    readStream(parquet dir, Iceberg-style layout)
      -> scrub UDF (same vectorized stage as batch — stateless, so the
         batch/stream plans are identical above the source)
      -> writeStream parquet sink, exactly-once via checkpoint + file-sink log

``Trigger.AvailableNow`` drains everything present then stops — the
batch-resume semantics expressed through Spark's own checkpoint machinery:
kill it mid-run, restart with the same checkpoint dir, and the file-source
offset log + sink commit log guarantee no duplicates and full coverage.
No watermarks/state: the scrub is per-row; dedup/windowing belong to
downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.toxicity import TOXICITY_COLS, ToxicityConfig
from ..operators.scrub import DEFAULT_SCRUB, ScrubConfig, with_scrub
from ..pipeline.run import DECISION_COLS, apply_toxicity


def scrub_file_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str | None = None,
    max_files_per_trigger: int | None = None,
    cfg: ScrubConfig = DEFAULT_SCRUB,
    toxicity: ToxicityConfig | None = None,
) -> DataFrame:
    """Streaming DataFrame of scrub decisions over a growing parquet dir.

    Column pruning applies to streaming scans exactly as to batch ones:
    only caption-side columns are read; image bytes never enter the stream.
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(input_dir)
        reader = reader.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)
    pruned = src.select("image_id", "phash_prefix", "caption")
    # Stateless projections compose identically under streaming, so the
    # optional toxicity stage (score + mask + keep-gate) is the exact batch
    # code path — schemas stay in lockstep with scrub_decisions.
    scrubbed = apply_toxicity(with_scrub(pruned, cfg=cfg), toxicity)
    extra = [] if toxicity is None else list(TOXICITY_COLS)
    # Same projection as the batch decisions table (scrub_decisions) —
    # consumers written against one schema must work on both.
    return scrubbed.withColumn("n_entities", F.size("entities")).select(
        *DECISION_COLS, "scrubbed", "scrubbed_simple", *extra
    )


def start_scrub_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    toxicity: ToxicityConfig | None = None,
) -> StreamingQuery:
    """Start the scrub stream with exactly-once parquet sink semantics."""
    decisions = scrub_file_stream(spark, input_dir, toxicity=toxicity)
    writer = (
        decisions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
