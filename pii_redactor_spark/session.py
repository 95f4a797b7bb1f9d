"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the sandbox (local[N], single JVM) but every setting is the one we
would ship on a multi-executor cluster:

* AQE on (+skew-join splitting + partition coalescing) — the north-star names
  AQE explicitly for heavy-hitter language buckets.
* Arrow on with a bounded batch size — the scrub UDF streams
  ``Iterator[pd.Series]`` batches; 10k captions/batch keeps Python-side memory
  flat regardless of partition size.
* shuffle.partitions sized to cores (overridable); at cluster scale this is
  replaced by AQE coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pii_redactor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # Pin ANSI semantics (the Spark 4 default) against cluster-level
        # spark-defaults overrides: under legacy ansi=false + sizeOfNull,
        # size(NULL) = -1 flips sign-sensitive expressions (round-3
        # advice on the toxicity keep-gate).  The expressions themselves
        # are also written NULL-total, so this is belt and braces.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
