"""Stateful streaming NEAR-dup detection — applyInPandasWithState over
MinHash-LSH band buckets.

Exact near-dup clustering is a global computation (batch:
``operators.dedup.neardup_clusters``); a continuous ingest wants the
streaming approximation: detect, as documents arrive, that a new document
is a likely near-duplicate of one already seen — across micro-batches and
restarts.

Shape: each document's MinHash signature (JVM higher-order functions —
stateless, streaming-safe) is exploded into ``bands`` (band, band_hash)
keys; groups are the LSH buckets, and the GroupState per bucket holds the
last ``max_per_bucket`` (id, signature) pairs.  A new arrival is compared
against the stored signatures position-wise — the MinHash estimate of
Jaccard — and emits a match event per stored near-neighbor.

Semantics (documented, not hidden): match events are AT-LEAST-ONCE per
pair — a pair colliding in several bands emits from each colliding
bucket, and consumers treat the stream as a monitoring/trigger signal or
dedup on (id, matched_id) downstream.  Recall is the banding collision
probability (1 − (1 − j^r)^bands); precision comes from the signature
comparison, not the bucket collision.  At 10^12 rows: RocksDB state
store, ProcessingTimeTimeout TTL for the re-crawl horizon, and
``max_per_bucket`` bounds state per bucket (hot buckets degrade to
most-recent-K, never to unbounded state).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import minhash_signature, with_shingles

MATCH_SCHEMA = (
    "id string, matched_id string, band int, est_jaccard double"
)
STATE_SCHEMA = "ids array<string>, sigs array<string>"


def _match_fn_factory(min_est_jaccard: float, max_per_bucket: int):
    def match_bucket(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        ids: list[str]
        sigs: list[list[int]]
        if state.exists:
            stored_ids, stored_sigs = state.get
            ids = list(stored_ids)
            sigs = [[int(x) for x in s.split(",")] for s in stored_sigs]
        else:
            ids, sigs = [], []
        out: list[tuple] = []
        for pdf in pdfs:
            for _id, sig in zip(pdf["_id"], pdf["sig"]):
                sig = [int(x) for x in sig]
                for prev_id, prev_sig in zip(ids, sigs):
                    n_eq = sum(a == b for a, b in zip(sig, prev_sig))
                    est = n_eq / len(sig)
                    if est >= min_est_jaccard:
                        out.append((str(_id), prev_id, band, est))
                ids.append(str(_id))
                sigs.append(sig)
                if len(ids) > max_per_bucket:
                    ids = ids[-max_per_bucket:]
                    sigs = sigs[-max_per_bucket:]
        state.update((
            ids,
            [",".join(str(x) for x in s) for s in sigs],
        ))
        if out:
            yield pd.DataFrame(
                out, columns=["id", "matched_id", "band", "est_jaccard"]
            )

    return match_bucket


def neardup_match_stream(
    stream: DataFrame,
    text_col: str = "caption",
    id_col: str = "image_id",
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    min_est_jaccard: float = 0.5,
    max_per_bucket: int = 16,
) -> DataFrame:
    """Match-event stream: (id, matched_id, band, est_jaccard) whenever an
    arriving document LSH-collides with a previously seen one and the
    MinHash estimate clears ``min_est_jaccard``."""
    rows_per_band = n_hashes // bands
    sig = with_shingles(stream, text_col, k).select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col("shingles"), n_hashes).alias("sig"),
    )
    banded = sig.select(
        "_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "sig", "bb.band", "bb.bhash")
    return banded.groupBy("band", "bhash").applyInPandasWithState(
        _match_fn_factory(min_est_jaccard, max_per_bucket),
        outputStructType=MATCH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
