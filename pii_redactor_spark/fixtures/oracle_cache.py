"""Materialized DuckDB oracle for the UDF-backed contract queries.

The scrub queries (``doc_scrub``, ``doc_entity_stats``) run the engine's
pandas UDF, which DuckDB cannot reproduce from SQL alone.  But their
*expected* outputs are fully determined by the row-at-a-time reference
oracle (``core.reference_impl.scrub_text`` — the same semantics the
differential property tests pin against the vectorized engine).  So the
oracle is two tiny parquet files materialized from that reference
implementation, and the DuckDB side becomes an ordinary GROUP BY over
them — converting both queries from rows-only checks to full
rows+schema+hash comparisons.

Spark never touches these files; they are DuckDB-side ground truth only.
Cache lives under the repo's gitignored ``.cache/`` and is rebuilt when
missing or older than the source documents table.
"""

from __future__ import annotations

import os

import pandas as pd

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def materialize_scrub_oracle(
    sf_dir: str, cache_root: str | None = None
) -> tuple[str, str]:
    """Build (scrub_expected, entity_expected) parquet for ``sf_dir``.

    scrub_expected:  doc_id, lang, keep, lang_detected     (one row per doc)
    entity_expected: doc_id, lang, entity_type, entity_len (one row per
        entity; docs with no entities contribute one NULL-typed row, so a
        plain GROUP BY reproduces Spark's explode_outer semantics)

    Returns absolute paths.  Deterministic and cheap at oracle scale
    (sf0.01 is a few hundred documents).
    """
    cache_root = cache_root or os.path.join(_REPO_ROOT, ".cache")
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(cache_root, f"oracle_{tag}")
    scrub_path = os.path.join(out_dir, "scrub_expected.parquet")
    ent_path = os.path.join(out_dir, "entity_expected.parquet")
    src = os.path.join(sf_dir, "documents.parquet")
    if (
        os.path.exists(scrub_path)
        and os.path.exists(ent_path)
        and os.path.getmtime(scrub_path) >= os.path.getmtime(src)
    ):
        return scrub_path, ent_path

    from ..core.reference_impl import scrub_text

    os.makedirs(out_dir, exist_ok=True)
    docs = pd.read_parquet(src, columns=["doc_id", "lang", "text"])
    scrub_rows: list[tuple] = []
    ent_rows: list[tuple] = []
    for doc_id, lang, text in docs.itertuples(index=False):
        r = scrub_text(text)
        scrub_rows.append((doc_id, lang, r.keep, r.lang))
        if r.entities:
            for e in r.entities:
                ent_rows.append((doc_id, lang, e["entity_type"],
                                 len(e["text"])))
        else:
            ent_rows.append((doc_id, lang, None, None))

    scrub_df = pd.DataFrame(
        scrub_rows, columns=["doc_id", "lang", "keep", "lang_detected"]
    )
    ent_df = pd.DataFrame(
        ent_rows, columns=["doc_id", "lang", "entity_type", "entity_len"]
    )
    # Force nullable dtypes: an all-NULL entity_type column would otherwise
    # land in parquet as a null/int type and break COALESCE(..., 'NONE').
    ent_df["entity_type"] = ent_df["entity_type"].astype("string")
    ent_df["entity_len"] = ent_df["entity_len"].astype("Int64")
    # atomic-ish: write tmp then replace, so a concurrent reader never sees
    # a half-written file
    for df, path in ((scrub_df, scrub_path), (ent_df, ent_path)):
        tmp = path + ".tmp"
        df.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return scrub_path, ent_path


def materialize_embedding_oracle(
    sf_dir: str, cache_root: str | None = None
) -> str:
    """Ground truth for the seeded embedding-index queries: per-vector
    LSH bucket (random-hyperplane sign bits, n_planes=8 seed=42) and IVF
    cell (cosine-nearest random spherical centroid, n_cells=16 seed=7),
    recomputed here in plain NumPy — an independent path from the Spark
    in-plan literals / Arrow UDF — so DuckDB can hash-check the index
    histograms instead of a rows-only count."""
    import numpy as np

    cache_root = cache_root or os.path.join(_REPO_ROOT, ".cache")
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(cache_root, f"oracle_{tag}")
    path = os.path.join(out_dir, "embedding_index_expected.parquet")
    src = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(src):
        return path

    from ..operators.similarity import _hyperplanes, _ivf_centroids

    os.makedirs(out_dir, exist_ok=True)
    emb = pd.read_parquet(src, columns=["vec_id", "embedding"])
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    planes = _hyperplanes(m.shape[1], 8, 42)
    bits = (m @ planes.T > 0).astype(np.int64)
    lsh_bucket = bits @ (1 << np.arange(8))
    cents = _ivf_centroids(m.shape[1], 16, 7)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ivf_cell = np.argmax((m / norms) @ cents.T, axis=1)
    out = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].to_numpy(),
            "lsh_bucket": lsh_bucket.astype(np.int32),
            "ivf_cell": ivf_cell.astype(np.int32),
        }
    )
    tmp = path + ".tmp"
    out.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path
