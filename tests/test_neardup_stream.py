"""Stateful streaming near-dup match detection across micro-batches."""

from __future__ import annotations

from conftest import drain_available_now
from pii_redactor_spark.streaming.neardup_stream import neardup_match_stream

SCHEMA = "image_id string, caption string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun near the garden"
)


def _run(spark, src_dir, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    drain_available_now(neardup_match_stream(stream), out_dir, ckpt)


def test_streaming_neardup_matches_across_batches(spark, tmp_root):
    src = f"{tmp_root}/nd_src"
    out = f"{tmp_root}/nd_out"
    ckpt = f"{tmp_root}/nd_ckpt"

    batch1 = spark.createDataFrame(
        [("a1", BASE),
         ("a2", "spark partitions shuffle data across executors for joins")],
        SCHEMA,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    _run(spark, src, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 0  # nothing resembles anything yet

    # batch 2, after a restart: a one-word edit of a batch-1 doc (near-dup
    # — state must surface it), an exact duplicate, and an unrelated doc
    batch2 = spark.createDataFrame(
        [("b1", BASE.replace("lazy", "sleepy")),
         ("b2", BASE),
         ("b3", "parquet files store columns with predicate pushdown")],
        SCHEMA,
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)
    matches = spark.read.parquet(out).collect()
    pairs = {(r["id"], r["matched_id"]) for r in matches}
    flat = {p for pair in pairs for p in pair}
    # the near-dup and the exact dup both matched something from state
    assert any(p[0] == "b1" for p in pairs), pairs
    assert any(p[0] == "b2" for p in pairs), pairs
    # the unrelated doc matched nothing
    assert "b3" not in flat
    # every match estimate respects the threshold; exact dup estimates 1.0
    assert all(r["est_jaccard"] >= 0.5 for r in matches)
    assert any(r["id"] == "b2" and r["est_jaccard"] == 1.0 for r in matches)
    # matched partner is always the batch-1 original
    assert all(r["matched_id"] in {"a1", "a2", "b1", "b2"} for r in matches)
