"""Decisions-consumer join + bucketed co-located joins (shuffle-free)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.fixtures.captions import CaptionConfig
from pii_redactor_spark.fixtures.images import write_fixture_tables
from pii_redactor_spark.pipeline.run import apply_decisions, scrub_decisions
from pii_redactor_spark.plans import plan_str
from pii_redactor_spark.sources.storage import write_bucketed


@pytest.fixture(scope="module")
def src_and_decisions(spark, tmp_root):
    path, _ = write_fixture_tables(
        spark, f"{tmp_root}/bk_fx", 600, CaptionConfig(), partitions=8
    )
    src = spark.read.parquet(path)
    decisions = scrub_decisions(src).cache()
    return src, decisions


def test_apply_decisions_correctness(spark, src_and_decisions):
    src, decisions = src_and_decisions
    applied = apply_decisions(src, decisions)
    n_kept = decisions.where(F.col("keep")).count()
    assert applied.count() == n_kept
    # captions are the scrubbed variant; bytes untouched from the source
    joined = applied.select("image_id", "caption").join(
        decisions.select("image_id", "scrubbed"), "image_id"
    )
    assert joined.where(F.col("caption") != F.col("scrubbed")).count() == 0
    assert "bytes" in applied.columns


def test_bucketed_join_has_no_shuffle(spark, src_and_decisions):
    src, decisions = src_and_decisions
    write_bucketed(
        src.select("image_id", "phash_prefix", "caption"),
        "bk_src", ["image_id"], n_buckets=8, sort_cols=["image_id"],
    )
    write_bucketed(
        decisions.select("image_id", "keep", "scrubbed"),
        "bk_dec", ["image_id"], n_buckets=8, sort_cols=["image_id"],
    )
    a = spark.table("bk_src")
    b = spark.table("bk_dec")
    # disable broadcast so the co-located sort-merge path is what's planned
    joined = a.hint("merge").join(b, "image_id")
    plan = plan_str(joined, mode="simple")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # bucketing removed both shuffles
    assert joined.count() == 600

def test_write_bucketed_rejects_qualified_names(spark):
    import pytest as _pytest

    from pii_redactor_spark.sources.storage import write_bucketed

    df = spark.range(5)
    with _pytest.raises(ValueError, match="unqualified"):
        write_bucketed(df, "somedb.sometable", ["id"])
