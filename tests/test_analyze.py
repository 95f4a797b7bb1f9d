"""Analysis aggregates (reference analyze_text family) over scrub output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.fixtures.captions import CaptionConfig
from pii_redactor_spark.fixtures.images import write_fixture_tables
from pii_redactor_spark.pipeline.analyze import (
    entity_count_histogram,
    entity_type_counts,
    error_sample,
    pii_char_ratio,
)
from pii_redactor_spark.operators.scrub import with_scrub


@pytest.fixture(scope="module")
def decisions(spark, tmp_root):
    path, labels = write_fixture_tables(
        spark, f"{tmp_root}/analyze_fx", 500, CaptionConfig(), partitions=8
    )
    df = with_scrub(
        spark.read.parquet(path).select("image_id", "caption")
    ).cache()
    return df, spark.read.parquet(labels)


def test_entity_type_counts(spark, decisions):
    df, _ = decisions
    counts = {r["entity_type"]: r["n_entities"]
              for r in entity_type_counts(df).collect()}
    assert counts  # PII templates guarantee entities exist
    valid = {"NAME", "ID_NUMBER", "PHONE", "EMAIL", "ADDRESS", "CREDIT_CARD",
             "DATE_OF_BIRTH", "PASSPORT", "BANK_ACCOUNT", "LICENSE_PLATE",
             "UNKNOWN"}
    assert set(counts) <= valid
    # total matches a direct explode count
    assert sum(counts.values()) == df.select(
        F.explode("entities")).count()


def test_pii_char_ratio_bounds(spark, decisions):
    df, _ = decisions
    row = pii_char_ratio(df).collect()[0]
    assert 0.0 <= row["mean_pii_ratio"] <= 1.0
    assert 0.0 <= row["max_pii_ratio"] <= 1.0
    assert 0 < row["rows_with_pii"] <= row["rows_total"] == 500


def test_entity_count_histogram_totals(spark, decisions):
    df, _ = decisions
    hist = entity_count_histogram(df).collect()
    assert sum(r["n_rows"] for r in hist) == 500
    assert any(r["n"] > 0 and r["n_rows"] > 0 for r in hist)


def test_error_sample_empty_when_engine_matches_oracle(spark, decisions):
    df, labels = decisions
    assert error_sample(df, labels).count() == 0


def test_error_sample_surfaces_injected_mismatch(spark, decisions):
    df, labels = decisions
    broken = df.withColumn(
        "scrubbed",
        F.when(F.col("image_id") == "img000000000007",
               F.lit("CORRUPTED")).otherwise(F.col("scrubbed")),
    )
    rows = error_sample(broken, labels).collect()
    assert len(rows) == 1
    assert rows[0]["image_id"] == "img000000000007"
    assert rows[0]["scrubbed"] == "CORRUPTED"
