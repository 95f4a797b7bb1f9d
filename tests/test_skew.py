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
    """With the cap on, the 10k-doc boilerplate keys never reach the
    all-pairs self-join: rare shingles contribute their full (tiny) pair
    sets, hot shingles contribute a salted SPANNING CHAIN (linear, m-1
    candidates instead of ~5*10^7), and every emitted pair carries the
    EXACT full-array Jaccard."""
    from pii_redactor_spark.operators.dedup import (
        connected_components,
        exact_jaccard,
        sparse_jaccard_pairs,
    )

    pairs = sparse_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", k=3, max_df=50
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    # linear, not quadratic: ~(n-1) chain pairs per hot shingle + 3
    # planted pairs, vs n*(n-1)/2 ≈ 5*10^7 uncapped candidates per hot key
    assert len(got) < 60_000, len(got)
    # the planted rare-shingle pairs all survive
    planted = {(100_001, 100_002), (100_003, 100_004), (100_005, 100_006)}
    assert planted <= set(got)
    # hot-shingle candidates form a SPANNING chain: the 10k boilerplate
    # docs stay connected through candidate edges (the property the
    # downstream components consumer needs) even though enumeration is
    # linear — no distant all-pairs edge like (0, 5000) is guaranteed,
    # connectivity is
    hot_edges = [
        (a, b) for (a, b) in got if a < 100_000 and b < 100_000
    ]
    edges_df = spark.createDataFrame(hot_edges, "id_a long, id_b long")
    comp = connected_components(edges_df, max_iter=32)
    agg = comp.agg(
        F.count("*").alias("members"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).collect()[0]
    assert agg["members"] == 10_000
    assert agg["clusters"] == 1
    # exactness: every emitted jaccard equals the direct full-array
    # computation for that pair (sample planted + two hot-chain edges)
    sample = list(planted) + hot_edges[:2]
    expect_df = spark.createDataFrame(sample, "id_a long, id_b long")
    expected = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard(
            expect_df, boilerplate_docs, "doc_id", "text", 3
        ).collect()
    }
    for p in sample:
        assert got[p] == expected[p], p
    # each planted pair: 6 words -> 4 shingles, sharing 4-1=3 of 5 distinct
    assert abs(got[(100_001, 100_002)] - 3 / 5) < 1e-12


def test_hot_chain_window_is_salted_and_bounded(spark, boilerplate_docs):
    """Round-3 ADVICE (medium): the chain pass must never window a whole
    hot posting list through one task.  Pins (a) the plan — the chain
    window's partition spec includes the salt column — and (b) the data —
    the largest (shingle, salt) group is ~m/S, far below the m-row
    posting list a bare-shingle window would funnel into one task."""
    import contextlib
    import io

    from pii_redactor_spark.operators.dedup import (
        CHAIN_SALT_BUCKETS,
        sparse_jaccard_pairs,
        with_shingles,
    )

    q = sparse_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", k=3, max_df=50
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="extended")
    plan = buf.getvalue()
    assert "windowspecdefinition(shingle" in plan, plan
    # every shingle-partitioned window spec carries a second partition
    # column (the salt for the chain pass, the salt-ordered bucket minima
    # for the bridge pass) — none windows the raw posting list
    specs = [
        seg.split(")", 1)[0]
        for seg in plan.split("windowspecdefinition(")[1:]
        if seg.startswith("shingle")
    ]
    assert specs and all("_salt" in s or "_lo" in s for s in specs), specs
    # data-level bound: max (shingle, salt) group ≈ m/S, not m
    m = 10_000
    sh = with_shingles(boilerplate_docs, "text", 3).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    biggest = (
        sh.withColumn(
            "_salt",
            F.pmod(F.xxhash64("doc_id"), F.lit(CHAIN_SALT_BUCKETS)),
        )
        .groupBy("shingle", "_salt")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert biggest < m // 8, biggest  # ~m/32 expected; m would be unsalted


def test_capped_matches_uncapped_on_shared_pairs(spark):
    """On a small corpus, every pair the capped form emits carries the
    identical Jaccard as the uncapped form; non-adjacent pairs sharing
    only hot shingles are the (documented) enumeration loss."""
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
    # every emitted pair is exact (== uncapped value)
    for p, j in capped.items():
        assert j == uncapped[p], p
    # rare-shingle pair present in full
    assert (1, 2) in capped
    # the df=3 hot shingle contributes a spanning chain over {1,2,3}:
    # 2 edges (connectivity preserved), not the full 3-pair clique —
    # pair-enumeration completeness is the documented trade
    hot_members = {1, 2, 3}
    hot_edges = {p for p in capped if set(p) <= hot_members}
    assert len(hot_edges) >= 2, hot_edges
    reached = {1}
    for _ in range(3):
        reached |= {
            b for e in hot_edges for b in e if reached & set(e)
        }
    assert reached == hot_members, hot_edges
    # never invents pairs: candidates are a subset of the uncapped form
    # (chain edges may or may not cover the full hot clique here — the
    # at-scale loss is pinned by test_capped_pairs_exact_and_cheap)
    assert set(capped) <= set(uncapped)


def test_mass_dup_cluster_survives_cap(spark):
    """The recall-cliff case: a near-dup cluster LARGER than max_df (every
    shared shingle is hot).  Chain candidates must keep the cluster
    connected so the downstream components consumer still finds ONE
    cluster covering all members."""
    from pii_redactor_spark.operators.dedup import (
        connected_components,
        sparse_jaccard_pairs,
    )

    n = 500
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        # 9 shared words + one varying token: pairwise jaccard ~0.6
        "concat('mass template caption body shared across every copy v',"
        " id % 7) AS text",
    )
    edges = (
        sparse_jaccard_pairs(docs, "doc_id", "text", k=3, max_df=50)
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    labels = connected_components(edges, max_iter=32)
    agg = labels.agg(
        F.count("*").alias("members"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).collect()[0]
    assert agg["members"] == n
    assert agg["clusters"] == 1
