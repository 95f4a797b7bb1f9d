"""Embedding similarity search: brute-force baseline + LSH scale path.

Brute-force cosine top-k stays entirely JVM-side (higher-order array
functions — ``zip_with``/``aggregate`` — inside whole-stage codegen).  The
scale path is random-hyperplane LSH: a seeded, data-independent projection
assigns each vector a ``n_planes``-bit bucket; candidate pairs come from
bucket-equality joins instead of the full cross product.  At 10^12 rows the
bucket column is also the natural partition key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector (broadcast literal)."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("cosine", cosine(F.col(vec_col), qv))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach an LSH bucket id: sign bits of seeded random projections.

    The hyperplanes are literals in the plan (seeded, tiny: n_planes x dim
    doubles), so bucketing runs JVM-side with no UDF and no shuffle.
    """
    bucket = F.lit(0)
    planes = _hyperplanes(dim, n_planes, seed)
    for p, plane in enumerate(planes):
        pv = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(F.col(vec_col), pv) > 0).cast("int")
        bucket = bucket + bit * F.lit(2**p)
    return df.withColumn("lsh_bucket", bucket)


def lsh_bucket_histogram(
    df: DataFrame, dim: int = 64, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Bucket-size histogram — the candidate-set cost profile of the index."""
    return (
        with_lsh_bucket(df, dim=dim, n_planes=n_planes, seed=seed)
        .groupBy("lsh_bucket")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
    )


def mean_pairwise_cosine(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Sum of cosine over ALL unordered pairs in closed form — zero joins.

    With unit-normalized vectors v̂, ``Σ_{i<j} cos(v_i, v_j)
    = (‖Σ v̂‖² − n) / 2`` (expand ‖Σ v̂‖² = Σ‖v̂‖² + 2 Σ_{i<j} v̂_i·v̂_j and
    every ‖v̂‖² = 1).  So the exact all-pairs mean needs only the per-dim
    sums of the normalized vectors: one narrow aggregation instead of an
    O(n²) self-join.  Returns one row: (n: long, sum_pairwise: double).

    Zero-norm vectors have no defined cosine; they are EXCLUDED from both
    ``n`` and the sums (the all-pairs join form would instead poison its
    average with NaNs), so pair statistics are over the vectors for which
    cosine exists.
    """
    normed = (
        df.select(F.col(vec_col).alias("_raw"))
        .withColumn("_nrm", F.sqrt(dot(F.col("_raw"), F.col("_raw"))))
        .where(F.col("_nrm") > 0)
        .select(
            F.transform(F.col("_raw"), lambda x: x / F.col("_nrm")).alias("_v")
        )
    )
    dims = normed.select(F.posexplode("_v").alias("dim", "v"))
    per_dim = dims.groupBy("dim").agg(F.sum("v").alias("s"))
    sumsq = per_dim.agg(
        F.sum(F.col("s") * F.col("s")).alias("_sumsq")
    )
    n = normed.agg(F.count("*").alias("n"))
    return n.crossJoin(sumsq).select(
        "n", ((F.col("_sumsq") - F.col("n")) / 2).alias("sum_pairwise")
    )


def neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 1,
) -> DataFrame:
    """Near-dup pairs by filter-then-verify: candidates from LSH bucket
    equality (equi-joins — the only shuffle keys), then exact cosine on the
    collisions only.  Recall per table is the LSH collision probability
    ``(1 − θ/π)^n_planes`` (θ = angle at the threshold); ``n_tables`` runs
    independent seeded tables and unions the candidate sets — table 0 uses
    ``seed`` itself, so raising ``n_tables`` strictly grows the candidate
    set.  Precision is always exact: every emitted pair is verified.
    """
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    pair_sets = []
    for t in range(n_tables):
        bucketed = with_lsh_bucket(
            base, dim=dim, n_planes=n_planes, seed=seed + 1_000_003 * t,
            vec_col="_v",
        ).select("_id", "lsh_bucket")
        a, b = bucketed.alias("a"), bucketed.alias("b")
        pair_sets.append(
            a.join(
                b,
                (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
                & (F.col("a._id") < F.col("b._id")),
            ).select(
                F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
            )
        )
    pairs = pair_sets[0]
    for extra in pair_sets[1:]:
        pairs = pairs.union(extra)
    if n_tables > 1:
        pairs = pairs.distinct()
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    scored = (
        pairs.join(va, "id_a").join(vb, "id_b")
        .select(
            "id_a", "id_b",
            cosine(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
    )
    return scored.where(F.col("cosine") >= threshold)


def _ivf_centroids(dim: int, n_cells: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def kmeans_fit(
    df: DataFrame,
    n_cells: int = 16,
    n_iter: int = 10,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Spherical k-means codebook (Lloyd) trained with Spark aggregations —
    upgrades the IVF quantizer from data-independent random directions to a
    data-fit one (higher recall at the same nprobe).

    Per iteration: assignment is the same broadcast-centroid Arrow matmul
    as ``ivf_assign``; the update is ``posexplode → groupBy(cell, dim) →
    sum`` — two hash aggregations with map-side partial agg, and the only
    thing ever collected is the (n_cells × dim) sum table (1k-ish rows
    regardless of input size).  At 10^12 rows pass ``sample_fraction`` —
    codebooks converge on a sample; assignment of the full table stays a
    single narrow pass.  Empty cells keep their previous centroid.
    Deterministic: seeded init, deterministic argmax, exact sums.
    """
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    cents = _ivf_centroids(dim, n_cells, seed)
    vecs = df.select(F.col(vec_col).alias("_v"))
    for _ in range(n_iter):
        assigned = ivf_assign(
            vecs, dim=dim, n_cells=n_cells, seed=seed, vec_col="_v",
            centroids=cents,
        )
        stats = (
            assigned.select("ivf_cell", F.posexplode("_v").alias("dim", "x"))
            .groupBy("ivf_cell", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        sums = np.zeros((n_cells, dim))
        counts = np.zeros(n_cells)
        for r in stats:
            sums[r["ivf_cell"], r["dim"]] = r["s"]
            counts[r["ivf_cell"]] = r["n"]
        nonempty = counts > 0
        means = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        new[nonempty] = means / norms
        if np.allclose(new, cents, atol=1e-9):
            cents = new
            break
        cents = new
    return cents


def ivf_assign(
    df: DataFrame,
    dim: int = 64,
    n_cells: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its cosine-nearest
    cell of a seeded random spherical codebook.

    The default codebook is data-independent and tiny (n_cells x dim), so
    assignment is one narrow Arrow-vectorized pass (NumPy matmul per batch)
    — no training job, no shuffle; pass ``centroids`` (e.g. from
    ``kmeans_fit``) for a data-fit codebook with the same plan.  At 10^12
    rows ``ivf_cell`` doubles as the storage partition key, so a query's
    nprobe cells map to partition-pruned scans instead of a full pass.
    """
    cents = centroids if centroids is not None else _ivf_centroids(
        dim, n_cells, seed
    )

    # Bound the scratch matrix: a scale-sized codebook (SemDeDup grows
    # cells ~ n/32) would otherwise allocate batch_rows x n_cells doubles
    # per Arrow batch (2.5 GB at 10k rows x 32k cells, per concurrent
    # task).  Chunk rows so the score block stays ~32 MB regardless of
    # codebook size; the matmul stays fully vectorized per chunk.
    chunk = max(64, (1 << 22) // max(len(cents), 1))

    @pandas_udf("int")
    def cell(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.values).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m /= norms
        parts = [
            np.argmax(m[i:i + chunk] @ cents.T, axis=1)
            for i in range(0, len(m), chunk)
        ]
        return pd.Series(np.concatenate(parts) if parts else [])

    # asNondeterministic stops Catalyst from splitting the evaluation when a
    # join on ivf_cell pushes an isnotnull(ivf_cell) predicate through the
    # projection — without it each join branch runs the UDF twice per row
    # (same double-eval class as the scrub UDF, operators/scrub.py).  The
    # function is in fact deterministic; the flag only gates pushdown.
    cell_stable = cell.asNondeterministic()
    return df.withColumn("ivf_cell", cell_stable(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    dim: int = 64,
    n_cells: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine over the query's nprobe nearest IVF
    cells only.  ``nprobe == n_cells`` degrades gracefully to exact search
    (the recall/latency dial a production index exposes).  ``centroids``
    swaps in a trained codebook (``kmeans_fit``)."""
    cents = centroids if centroids is not None else _ivf_centroids(
        dim, n_cells, seed
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cents @ qn))[:nprobe].tolist()
    candidates = ivf_assign(
        df, dim=dim, n_cells=n_cells, seed=seed, vec_col=vec_col,
        centroids=cents,
    ).where(F.col("ivf_cell").isin([int(p) for p in probe]))
    return brute_force_topk(candidates.drop("ivf_cell"), query_vec, k,
                            vec_col, id_col)


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    dim: int = 64,
    n_cells: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> None:
    """Materialize the ANN store partitioned by IVF cell: each cell is a
    partition directory, so an nprobe search is a partition-PRUNED scan —
    the cells outside the probe set are never read from storage (the
    Iceberg form is the identity partition transform on ivf_cell).
    One repartition on the cell id before the write keeps file counts
    bounded by cells, not tasks × cells."""
    assigned = ivf_assign(
        df, dim=dim, n_cells=n_cells, seed=seed, vec_col=vec_col,
        centroids=centroids,
    )
    assigned.repartition("ivf_cell").write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(path)


def ivf_topk_partitioned(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    dim: int = 64,
    n_cells: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Top-k against a ``write_ivf_partitioned`` store: the probe-cell
    filter is a partition filter (verify: PartitionFilters on the scan in
    ``.explain``), so storage cost is nprobe/n_cells of the table."""
    cents = centroids if centroids is not None else _ivf_centroids(
        dim, n_cells, seed
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = [int(p) for p in np.argsort(-(cents @ qn))[:nprobe]]
    candidates = spark.read.parquet(path).where(
        F.col("ivf_cell").isin(probe)
    )
    return brute_force_topk(
        candidates.drop("ivf_cell"), query_vec, k, vec_col, id_col
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket."""
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec)
    qbucket = int(sum((planes @ q > 0).astype(int) * (2 ** np.arange(n_planes))))
    bucketed = with_lsh_bucket(df, dim=dim, n_planes=n_planes, seed=seed)
    candidates = bucketed.where(F.col("lsh_bucket") == qbucket)
    return brute_force_topk(candidates, query_vec, k, vec_col, id_col)
