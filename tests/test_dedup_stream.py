"""Stateful streaming dedup: first occurrence only, state survives restart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import drain_available_now
from pii_redactor_spark.streaming.dedup_stream import dedup_stream

SCHEMA = "image_id string, caption string"


def _run(spark, src_dir, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    drain_available_now(dedup_stream(stream), out_dir, ckpt)


def test_streaming_dedup_across_batches(spark, tmp_root):
    src = f"{tmp_root}/dd_src"
    out = f"{tmp_root}/dd_out"
    ckpt = f"{tmp_root}/dd_ckpt"

    batch1 = spark.createDataFrame(
        [("a1", "the quick brown fox"),
         ("a2", "the quick brown fox"),     # dup within batch
         ("a3", "a completely new caption")],
        SCHEMA,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    _run(spark, src, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 2  # one per distinct caption
    assert got1.select("fp").distinct().count() == 2

    # batch 2: repeats of batch-1 content (state must suppress them after
    # restart) plus one genuinely new caption
    batch2 = spark.createDataFrame(
        [("b1", "the quick brown fox"),      # dup across batches
         ("b2", "a completely new caption"),  # dup across batches
         ("b3", "never seen before text")],
        SCHEMA,
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 3
    caps = {r["caption"] for r in got2.collect()}
    assert caps == {"the quick brown fox", "a completely new caption",
                    "never seen before text"}
    # the cross-batch dup rows b1/b2 were suppressed by restored state
    ids = {r["image_id"] for r in got2.collect()}
    assert "b1" not in ids and "b2" not in ids and "b3" in ids
