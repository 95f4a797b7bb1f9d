"""Watermarked windowed aggregation over the decisions stream."""

from __future__ import annotations

import datetime

import pytest

from conftest import drain_available_now
from pyspark.sql import functions as F

from pii_redactor_spark.streaming.metrics_stream import windowed_decision_metrics

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _mk_rows(spark, offsets_sec, keep=True, lang="en"):
    rows = [
        (f"img{i:06d}", lang, keep, 1, T0 + datetime.timedelta(seconds=s))
        for i, s in enumerate(offsets_sec)
    ]
    return spark.createDataFrame(
        rows,
        "image_id string, lang string, keep boolean, n_entities int, "
        "ingest_ts timestamp",
    )


def test_windowed_metrics_batch_semantics(spark):
    df = _mk_rows(spark, [0, 10, 59, 60, 61, 125])
    out = windowed_decision_metrics(df).orderBy("window_start").collect()
    assert [r["n_rows"] for r in out] == [3, 2, 1]  # 1-min windows
    assert all(r["n_kept"] == r["n_rows"] for r in out)
    assert out[0]["window_start"] == T0


def test_streaming_watermark_drops_late_rows(spark, tmp_root):
    """Feed two micro-batches through a real stream: batch 2 contains a row
    2 windows older than the advanced watermark — it must NOT appear."""
    src_dir = f"{tmp_root}/ms_src"
    ckpt = f"{tmp_root}/ms_ckpt"
    out_dir = f"{tmp_root}/ms_out"

    batch1 = _mk_rows(spark, [0, 30, 600])  # max event time T0+10min
    batch1.coalesce(1).write.mode("overwrite").parquet(src_dir)

    def run_available():
        stream = (
            spark.readStream.schema(batch1.schema).parquet(src_dir)
        )
        drain_available_now(
            windowed_decision_metrics(stream), out_dir, ckpt
        )

    run_available()
    # append mode only emits finalized windows (older than watermark):
    # watermark = T0+10min - 2min => the T0 window (rows at 0,30) finalized.
    first = spark.read.parquet(out_dir).collect()
    t0_first = [r for r in first if r["window_start"] == T0]
    assert len(t0_first) == 1 and t0_first[0]["n_rows"] == 2

    # batch 2: one on-time row + one very late row (T0+5s, far older than
    # the watermark) whose window is already finalized
    late = _mk_rows(spark, [5, 660])
    late.coalesce(1).write.mode("append").parquet(src_dir)
    run_available()
    rows = spark.read.parquet(out_dir).collect()
    # the late row's window (T0) was finalized with n_rows=2; it is NOT
    # re-emitted or updated — the late row was dropped from aggregation
    t0_rows = [r for r in rows if r["window_start"] == T0]
    assert len(t0_rows) == 1 and t0_rows[0]["n_rows"] == 2
