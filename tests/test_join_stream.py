"""Streaming joins: stream-static broadcast enrichment and watermarked
stream-stream equi-join (cross-batch buffered state + checkpoint recovery)."""

from __future__ import annotations

import pytest

from conftest import drain_available_now
from pii_redactor_spark.streaming.join_stream import (
    enrich_with_static,
    join_event_streams,
)

LEFT_SCHEMA = "image_id string, ts timestamp, caption string"
RIGHT_SCHEMA = "image_id string, ts timestamp, quality double"


def _drain(df, out_dir, ckpt):
    drain_available_now(df, out_dir, ckpt)


def test_stream_static_enrichment_matches_batch_and_broadcasts(
    spark, tmp_root
):
    src = f"{tmp_root}/ss_src"
    out = f"{tmp_root}/ss_out"
    ckpt = f"{tmp_root}/ss_ckpt"
    rows = [
        ("a", "2024-01-01 00:00:00", "hello world"),
        ("b", "2024-01-01 00:01:00", "bonjour"),
        ("c", "2024-01-01 00:02:00", "no policy lang"),
    ]
    batch = (
        spark.createDataFrame(rows, "image_id string, ts string, caption string")
        .selectExpr("image_id", "CAST(ts AS TIMESTAMP) AS ts", "caption")
    )
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [("a", "keep"), ("b", "review")], "image_id string, policy string"
    )

    stream = spark.readStream.schema(LEFT_SCHEMA).parquet(src)
    enriched = enrich_with_static(stream, dim, "image_id")
    _drain(enriched, out, ckpt)

    got = {
        (r["image_id"], r["policy"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["image_id"], r["policy"])
        for r in batch.join(dim, "image_id", "left").collect()
    }
    assert got == want == {("a", "keep"), ("b", "review"), ("c", None)}

    # the static side must carry the broadcast hint (streaming plans can't
    # be optimized pre-start, so pin it on the analyzed logical plan)
    plan = enriched._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in plan.lower(), plan


def test_stream_static_rejects_streaming_dim(spark, tmp_root):
    src = f"{tmp_root}/ssr_src"
    spark.createDataFrame(
        [("a", "x")], "image_id string, caption string"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "image_id string, caption string"
    ).parquet(src)
    with pytest.raises(ValueError, match="static"):
        enrich_with_static(stream, stream, "image_id")


def test_stream_stream_join_buffers_across_batches(spark, tmp_root):
    lsrc = f"{tmp_root}/j_left"
    rsrc = f"{tmp_root}/j_right"
    out = f"{tmp_root}/j_out"
    ckpt = f"{tmp_root}/j_ckpt"

    def mk(rows, schema_cols):
        return spark.createDataFrame(
            rows, f"image_id string, ts string, {schema_cols}"
        ).selectExpr(
            "image_id", "CAST(ts AS TIMESTAMP) AS ts",
            schema_cols.split(" ")[0],
        )

    # batch 1: left a+b; right only a (in range) and z (no left match)
    mk(
        [("a", "2024-01-01 00:00:00", "cap-a"),
         ("b", "2024-01-01 00:05:00", "cap-b")],
        "caption string",
    ).coalesce(1).write.mode("overwrite").parquet(lsrc)
    mk(
        [("a", "2024-01-01 00:03:00", 0.9),
         ("z", "2024-01-01 00:03:00", 0.1)],
        "quality double",
    ).coalesce(1).write.mode("overwrite").parquet(rsrc)

    def run():
        left = spark.readStream.schema(LEFT_SCHEMA).parquet(lsrc)
        right = spark.readStream.schema(RIGHT_SCHEMA).parquet(rsrc)
        joined = join_event_streams(
            left, right, key="image_id", max_delay="10 minutes"
        ).select("image_id", "caption", "r_quality")
        _drain(joined, out, ckpt)

    run()
    got1 = {
        (r["image_id"], r["r_quality"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {("a", 0.9)}

    # batch 2 (fresh run, same checkpoint — state recovered): the match
    # for b arrives late but within the 10-minute bound; a second right
    # row for a outside the bound must NOT join.
    mk(
        [("b", "2024-01-01 00:09:00", 0.7),
         ("a", "2024-01-01 00:30:00", 0.2)],
        "quality double",
    ).coalesce(1).write.mode("append").parquet(rsrc)
    run()
    got2 = {
        (r["image_id"], r["r_quality"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {("a", 0.9), ("b", 0.7)}
