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


# --- hot-shingle prefix filtering (sparse_jaccard_pairs max_df) --------------


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """10k docs that ALL share one boilerplate shingle (the skew killer: an
    uncapped inverted-index self-join would put ~5·10^7 candidate rows on
    that single join key), plus three planted near-dup pairs that share
    rare shingles."""
    n = 10_000
    base = spark.range(n).selectExpr(
        "id AS doc_id",
        # every doc: same 3-word boilerplate prefix + unique 3-word tail
        "concat('the same boilerplate header follows here u', id, "
        "' v', id, ' w', id) AS text",
    )
    dups = spark.createDataFrame(
        [
            (100_001, "alpha beta gamma delta epsilon zeta"),
            (100_002, "alpha beta gamma delta epsilon eta"),
            (100_003, "unique rare shingle run one two three"),
            (100_004, "unique rare shingle run one two four"),
            (100_005, "totally different rare words entirely here"),
            (100_006, "totally different rare words entirely there"),
        ],
        "doc_id long, text string",
    )
    return base.union(dups).cache()


def test_prefix_filter_bounds_posting_lists(spark, boilerplate_docs):
    """After the document-frequency cap, no indexed shingle's posting list
    (= self-join key input) exceeds max_df — the uncapped index provably
    has a 10k-doc hot key."""
    from pii_redactor_spark.operators.dedup import with_shingles

    max_df = 50
    sh = with_shingles(boilerplate_docs, "text", 3).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    hot = df_counts.agg(F.max("df").alias("m")).collect()[0]["m"]
    assert hot >= 10_000  # the skew is real before the cap
    capped_max = (
        df_counts.where(F.col("df") <= max_df)
        .agg(F.coalesce(F.max("df"), F.lit(0)).alias("m"))
        .collect()[0]["m"]
    )
    assert capped_max <= max_df  # bounded per-key join input


def test_capped_pairs_exact_and_cheap(spark, boilerplate_docs):
    """With the cap on, the 10k-doc boilerplate key never reaches the
    self-join: candidates come from rare shingles only, and every emitted
    pair carries the EXACT full-array Jaccard (verified against a direct
    per-pair computation)."""
    from pii_redactor_spark.operators.dedup import (
        exact_jaccard,
        sparse_jaccard_pairs,
    )

    pairs = sparse_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", k=3, max_df=50
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    # only the planted rare-shingle pairs survive the prefix filter
    assert set(got) == {
        (100_001, 100_002),
        (100_003, 100_004),
        (100_005, 100_006),
    }
    # exactness: jaccard computed over the FULL shingle arrays, not the
    # capped index
    expect_df = spark.createDataFrame(
        [(a, b) for a, b in got], "id_a long, id_b long"
    )
    expected = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard(
            expect_df, boilerplate_docs, "doc_id", "text", 3
        ).collect()
    }
    assert got == expected
    # each planted pair: 6 words -> 4 shingles, sharing 4-1=3 of 5 distinct
    assert abs(got[(100_001, 100_002)] - 3 / 5) < 1e-12


def test_capped_matches_uncapped_on_rare_shingle_pairs(spark):
    """On a small corpus, pairs that share at least one rare shingle get
    identical Jaccard from the capped and uncapped forms."""
    from pii_redactor_spark.operators.dedup import sparse_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "shared prefix words alpha beta gamma"),
            (2, "shared prefix words alpha beta delta"),
            (3, "shared prefix words epsilon zeta eta"),
            (4, "completely different text over here now"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in sparse_jaccard_pairs(docs, "doc_id", "text", 3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in sparse_jaccard_pairs(
            docs, "doc_id", "text", 3, max_df=2
        ).collect()
    }
    # docs 1/2 share the rare shingles containing alpha/beta: exact match
    assert capped[(1, 2)] == uncapped[(1, 2)]
    # pair (1,3)/(2,3) share ONLY the df=3 boilerplate shingles -> filtered
    assert (1, 3) in uncapped and (1, 3) not in capped
    assert set(capped) == {(1, 2)}
