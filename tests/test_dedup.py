"""Dedup operators: exact, MinHash-LSH, SimHash with planted near-dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.operators.dedup import (
    dedupe_exact,
    exact_dedup_stats,
    exact_jaccard,
    minhash_lsh_candidates,
    simhash64,
    simhash_candidates,
    with_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun near the garden"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 3 exact copies of doc 0
    for i in range(3):
        rows.append((f"d{i:03d}", BASE))
    # near-dup: one word changed
    rows.append(("d100", BASE.replace("lazy", "sleepy")))
    # near-dup: word appended
    rows.append(("d101", BASE + " today"))
    # unrelated docs
    for i, txt in enumerate(
        [
            "completely different content about distributed query engines",
            "spark partitions shuffle data across executors for joins",
            "parquet files store columns with predicate pushdown support",
            "image captions travel as binary columns with typed metadata",
        ]
    ):
        rows.append((f"d2{i:02d}", txt))
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_exact_dedup_stats_and_dedupe(spark, corpus):
    stats = exact_dedup_stats(corpus).collect()[0]
    assert stats["dup_groups"] == 1
    assert stats["dup_docs"] == 3
    deduped = dedupe_exact(corpus)
    assert deduped.count() == corpus.count() - 2
    # deterministic representative: the min doc_id survives
    kept = {r["doc_id"] for r in deduped.collect()}
    assert "d000" in kept and "d001" not in kept and "d002" not in kept


def test_minhash_lsh_finds_planted_neardups(spark, corpus):
    cand = minhash_lsh_candidates(corpus).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in cand}
    # exact copies and both near-dups must collide in some band
    assert ("d000", "d001") in pairs
    assert ("d000", "d100") in pairs
    assert ("d000", "d101") in pairs
    # unrelated docs must not pair with the BASE cluster
    base_cluster = {"d000", "d001", "d002", "d100", "d101"}
    for a, b in pairs:
        assert (a in base_cluster) == (b in base_cluster), (a, b)


def test_filter_then_verify_contract(spark, corpus):
    cand = minhash_lsh_candidates(corpus)
    verified = exact_jaccard(cand, corpus)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert jac[("d000", "d001")] == 1.0           # exact copies
    assert jac[("d000", "d100")] > 0.7            # one-word edit
    assert all(j > 0.5 for j in jac.values())     # candidates are real


def test_simhash_exact_copies_and_neardups(spark, corpus):
    sim = simhash64(corpus)
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals["d000"] == vals["d001"] == vals["d002"]
    cands = simhash_candidates(sim, max_hamming=6).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in cands}
    assert pairs[("d000", "d001")] == 0
    assert ("d000", "d100") in pairs  # one-word edit stays within hamming 6
    # unrelated docs don't enter the base cluster
    base_cluster = {"d000", "d001", "d002", "d100", "d101"}
    for a, b in pairs:
        assert (a in base_cluster) == (b in base_cluster), (a, b)


def test_shingles_deterministic(spark, corpus):
    a = with_shingles(corpus).select("doc_id", "shingles").collect()
    b = with_shingles(corpus).select("doc_id", "shingles").collect()
    assert sorted((r["doc_id"], tuple(r["shingles"])) for r in a) == sorted(
        (r["doc_id"], tuple(r["shingles"])) for r in b
    )


def test_minhash_scales_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cand = minhash_lsh_candidates(docs)
    verified = exact_jaccard(cand, docs)
    # sanity at corpus scale: every surviving pair has meaningful overlap
    low = verified.where(F.col("jaccard") < 0.05).count()
    total = verified.count()
    assert total >= 0
    if total:
        assert low / total < 0.9  # banding concentrates on real overlap


def test_sparse_jaccard_matches_allpairs_ground_truth(spark, corpus):
    """The inverted-index exact Jaccard must equal a brute-force python
    all-pairs computation on every sharing pair (and omit only
    zero-overlap pairs)."""
    from pii_redactor_spark.operators.dedup import sparse_jaccard_pairs

    rows = {r["doc_id"]: r["shingles"]
            for r in with_shingles(corpus).collect()}
    truth = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = set(rows[a]), set(rows[b])
            j = len(sa & sb) / len(sa | sb)
            if j > 0:
                truth[(a, b)] = j
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in sparse_jaccard_pairs(corpus).collect()}
    assert set(got) == set(truth)
    for k in truth:
        assert abs(got[k] - truth[k]) < 1e-12, (k, got[k], truth[k])


def test_neardup_clusters_and_dedupe_near(spark, corpus):
    """End-to-end near-dedup: the planted base cluster (3 exact copies +
    2 one-edit variants) collapses to one representative; unrelated docs
    survive untouched."""
    from pii_redactor_spark.operators.dedup import dedupe_near, neardup_clusters

    members = neardup_clusters(corpus, min_jaccard=0.5)
    got = {r["doc_id"]: r["cluster_id"] for r in members.collect()}
    base_cluster = {"d000", "d001", "d002", "d100", "d101"}
    assert set(got) == base_cluster
    assert set(got.values()) == {"d000"}  # min-id label propagated
    kept = dedupe_near(corpus, min_jaccard=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert "d000" in ids
    assert not (base_cluster - {"d000"}) & ids
    assert ids >= {r["doc_id"] for r in corpus.select("doc_id").collect()} - base_cluster


def test_connected_components_long_chain_converges_logarithmically(spark):
    """A 10k-vertex path graph: plain min-label propagation needs ~10k
    rounds (and previously RAISED at max_iter); pointer jumping must
    converge in O(log n) rounds and label every vertex with the chain
    min."""
    from pii_redactor_spark.operators.dedup import connected_components

    n = 10_000
    edges = spark.range(n - 1).selectExpr(
        "id AS id_a", "id + 1 AS id_b"
    )
    labels = connected_components(edges, id_col="doc_id", max_iter=32)
    agg = labels.agg(
        F.count("*").alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        F.min("cluster_id").alias("m"),
    ).collect()[0]
    assert agg["n"] == n
    assert agg["k"] == 1
    assert agg["m"] == 0


def test_connected_components_multi_component_correctness(spark):
    """Mixed shapes in one edge list: a 500-vertex path, a star, a
    triangle, and an isolated edge — every vertex must get its component's
    min id."""
    from pii_redactor_spark.operators.dedup import connected_components

    path = [(i, i + 1) for i in range(1000, 1500)]
    star = [(2000, x) for x in range(2001, 2020)]
    tri = [(3000, 3001), (3001, 3002), (3002, 3000)]
    lone = [(4000, 4001)]
    edges = spark.createDataFrame(
        path + star + tri + lone, "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, max_iter=32).collect()
    }
    for v in range(1000, 1501):
        assert got[v] == 1000
    for v in range(2000, 2020):
        assert got[v] == 2000
    for v in (3000, 3001, 3002):
        assert got[v] == 3000
    assert got[4000] == got[4001] == 4000


def test_decontaminate_drops_exact_ngram_overlap(spark):
    """Benchmark decontamination: any train doc sharing a single word
    5-gram with the bench corpus is dropped; everything else survives.
    The train side must be filtered by a BROADCAST semi-join (no train
    shuffle)."""
    import contextlib
    import io

    from pii_redactor_spark.operators.dedup import (
        contaminated_ids,
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog today"),
            (2, "completely unrelated caption about mountain lakes here"),
            (3, "prefix words then the quick brown fox jumps embedded"),
            (4, "short doc"),  # < 5 tokens: no grams, must survive
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "benchmark question: the quick brown fox jumps over what")],
        "doc_id long, text string",
    )
    bad = {r["doc_id"] for r in
           contaminated_ids(train, bench, n=5).collect()}
    assert bad == {1, 3}
    survivors = {r["doc_id"] for r in
                 decontaminate(train, bench, n=5).collect()}
    assert survivors == {2, 4}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decontaminate(train, bench, n=5).explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_substring_dup_pairs_exact_and_winnowed(spark):
    """Cross-document exact-substring duplication: the exact index finds
    every pair sharing a 40-char run; the winnowed sketch (a) bounds
    postings per doc, (b) still finds every pair whose shared run is at
    least window + winnow - 1 chars (the winnowing guarantee), and (c)
    never emits a pair the exact index would not (precision)."""
    from pii_redactor_spark.operators.dedup import (
        substring_dup_pairs,
        substring_postings,
    )

    boiler = "This exact boilerplate sentence is repeated across documents!"
    assert len(boiler) >= 40 + 8 - 1  # >= window + winnow - 1
    docs = spark.createDataFrame(
        [
            (1, f"unique prefix one {boiler} unique suffix alpha"),
            (2, f"other beginning text {boiler} different ending beta"),
            (3, "entirely unrelated caption with no shared runs at all "
                "padded to be comfortably long enough for windows"),
            # last char before / first char after the boilerplate differ
            # across docs 1/2/4, so NO boundary-crossing window is shared
            # by only two docs (the max_df assertion depends on that)
            (4, f"third copy 4q9 {boiler} trailing words gamma"),
            (5, "short"),  # shorter than the window: no postings
        ],
        "doc_id long, text string",
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in substring_dup_pairs(docs, window=40).collect()
    }
    assert exact == {(1, 2), (1, 4), (2, 4)}
    winnowed = {
        (r["id_a"], r["id_b"])
        for r in substring_dup_pairs(docs, window=40, winnow=8).collect()
    }
    assert winnowed == exact  # guarantee holds for the 61-char shared run
    # sketch actually bounds the index: far fewer postings than windows
    n_exact = substring_postings(docs, window=40).count()
    n_win = substring_postings(docs, window=40, winnow=8).count()
    assert n_win < n_exact / 2, (n_win, n_exact)
    # max_df cap: the boilerplate run shared by 3 docs dies at max_df=2
    capped = {
        (r["id_a"], r["id_b"])
        for r in substring_dup_pairs(docs, window=40, max_df=2).collect()
    }
    assert capped == set()
