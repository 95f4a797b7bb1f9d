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
    mean_confidence,
    pii_char_ratio,
    with_analysis,
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


def test_mean_confidence_bounds(spark, decisions):
    df, _ = decisions
    row = mean_confidence(df).collect()[0]
    # All detection banks score in [0.5, 1.0] by construction.
    assert 0.5 <= row["mean_confidence"] <= 1.0
    assert row["n_entities"] == df.select(F.explode("entities")).count()


def test_with_analysis_matches_reference_shape(spark, decisions):
    """Per-row analyze_text struct (inference.py:425-466): counts, ratio,
    avg confidence — cross-checked against python recomputation."""
    df, _ = decisions
    rows = with_analysis(df).select(
        "caption", "entities", "analysis"
    ).head(50)
    for r in rows:
        a = r["analysis"]
        ents = r["entities"]
        assert a["total_entities"] == len(ents)
        counts: dict[str, int] = {}
        for e in ents:
            t = e["entity_type"] or "UNKNOWN"
            counts[t] = counts.get(t, 0) + 1
        assert dict(a["entity_counts"]) == counts
        pii_chars = sum(len(e["text"]) for e in ents)
        want_ratio = pii_chars / len(r["caption"]) if r["caption"] else 0.0
        assert abs(a["pii_character_ratio"] - want_ratio) < 1e-9
        want_conf = (
            sum(e["confidence"] for e in ents) / len(ents) if ents else 0.0
        )
        assert abs(a["average_confidence"] - want_conf) < 1e-9


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


def test_make_scrub_udf_config_round_trip(spark):
    """ScrubConfig dials (threshold, replacement, preserve_format) flow
    through the configured UDF and change only what they should."""
    from pii_redactor_spark.operators.scrub import ScrubConfig, make_scrub_udf

    df = spark.createDataFrame(
        [("a", "my id is 123456789"),
         ("b", "Contact john.smith@example.com now")],
        "image_id string, caption string",
    )
    strict = make_scrub_udf(
        ScrubConfig(confidence_threshold=0.7, replacement="<PII>",
                    preserve_format=False)
    )
    got = {
        r["image_id"]: r
        for r in df.withColumn("s", strict(F.col("caption")))
        .select("image_id", "s.entities", "s.scrubbed").collect()
    }
    # bare-9-digit span (conf 0.65) dropped by the 0.7 threshold
    assert got["a"]["entities"] == []
    assert got["a"]["scrubbed"] == "my id is 123456789"
    # email survives; preserve_format=False masks with the custom token
    assert [e["entity_type"] for e in got["b"]["entities"]] == ["EMAIL"]
    assert got["b"]["entities"][0]["confidence"] == 0.99
    assert got["b"]["scrubbed"] == "Contact <PII> now"


def test_analyze_job_end_to_end(spark, tmp_root, decisions):
    """jobs/analyze_job.analyze_to writes all four analysis tables from a
    materialized decisions table."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "analyze_job", "jobs/analyze_job.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    df, _ = decisions
    path = f"{tmp_root}/anj_in"
    df.write.mode("overwrite").parquet(path)
    out = f"{tmp_root}/anj_out"
    mod.analyze_to(spark, path, out)
    assert spark.read.parquet(f"{out}/entity_counts").count() > 0
    mc = spark.read.parquet(f"{out}/mean_confidence").collect()[0]
    assert 0.5 <= mc["mean_confidence"] <= 1.0
    assert spark.read.parquet(f"{out}/pii_ratio").count() == 1
    hist = spark.read.parquet(f"{out}/entity_histogram")
    assert sum(r["n_rows"] for r in hist.collect()) == 500
