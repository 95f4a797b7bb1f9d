"""Skew handling: salted repartition balances heavy-hitter buckets without
changing results (SURVEY.md §4 custom-handling item 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.fixtures.captions import CaptionConfig
from pii_redactor_spark.fixtures.images import write_fixture_tables


@pytest.fixture(scope="module")
def skewed_images(spark, tmp_root):
    # 70% of captions in one language + a long-caption tail: the heavy-hitter
    # shape the north star names.
    cfg = CaptionConfig(heavy_language=("he", 0.7), long_tail_ratio=0.05)
    path, _ = write_fixture_tables(
        spark, f"{tmp_root}/skew_fx", 1200, cfg, partitions=8
    )
    return spark.read.parquet(path)


def test_fixture_is_actually_skewed(spark, skewed_images):
    from pii_redactor_spark.pipeline.run import scrub_decisions

    langs = (
        scrub_decisions(skewed_images)
        .groupBy("lang").count().collect()
    )
    top = max(r["count"] for r in langs)
    assert top / 1200 > 0.5  # one language dominates


def _task_imbalance(df, n_parts: int, *cols) -> float:
    sizes = (
        df.repartition(n_parts, *cols)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in sizes]
    return max(counts) / (sum(counts) / n_parts)


def test_salted_repartition_balances_tasks(spark, skewed_images):
    """Keying the shuffle by (key, salt) must spread the heavy hitter that a
    key-only shuffle concentrates into one task."""
    from pii_redactor_spark.pipeline.run import scrub_decisions

    decisions = scrub_decisions(skewed_images).select("lang", "n_chars").cache()
    n_parts = 16
    # shuffle keyed on the skewed column: the 70% language lands in ONE task
    skew_ratio = _task_imbalance(decisions, n_parts, F.col("lang"))
    salt_ratio = _task_imbalance(
        decisions, n_parts, F.col("lang"), (F.rand(42) * 16).cast("int")
    )
    decisions.unpersist()
    assert skew_ratio > 5, skew_ratio       # the problem is real
    assert salt_ratio < 2.5, salt_ratio     # salting dissolves it


def test_salting_does_not_change_results(spark, skewed_images):
    from pii_redactor_spark.pipeline.run import scrub_decisions

    plain = scrub_decisions(skewed_images).select(
        "image_id", "keep", "scrubbed", "lang"
    )
    salted = scrub_decisions(skewed_images, salt_partitions=16).select(
        "image_id", "keep", "scrubbed", "lang"
    )
    assert plain.count() == salted.count() == 1200
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
