"""Point-in-interval (range) joins without a cartesian product.

Spark turns a bare ``p.value BETWEEN i.lo AND i.hi`` join into
BroadcastNestedLoopJoin (small build side) or a cartesian product — both
enumerate |points| x |intervals| pairs, which is exactly the all-pairs shape
every other operator in this engine avoids.  ``interval_join`` quantizes the
join instead, the standard trick used by spatial/temporal engines:

* every point maps to ONE bucket ``floor(point / width)``;
* every interval explodes to the buckets it covers
  (``sequence(floor(lo/w), floor(hi/w))`` — bounded by ``(hi-lo)/w + 1``
  rows per interval);
* an ordinary hash equi-join on the bucket key finds every candidate pair
  (a point inside an interval shares a bucket with it by construction), and
  the residual ``lo <= point < hi`` filter removes false candidates within
  the boundary buckets.

Exact: each (point, interval) pair is produced at most once because the
point side owns exactly one bucket — no post-join dedup.  At scale the only
shuffle keys on the bucket; skewed value distributions land on AQE's skew
split like any other hot equi-key, and ``bucket_width`` dials the trade
between interval replication (small width) and residual-filter selectivity
(large width): width on the order of the median interval length keeps
replication at ~2x.

**Hot buckets beyond AQE's reach** (round-4 verdict #7): AQE's skew join
only splits partitions past ``skewedPartitionThresholdInBytes`` (256 MB by
default) AND ``skewedPartitionFactor`` x the median — a hot value bucket
below that line, or a plan AQE declines to rewrite, still lands in one
task.  ``salt_buckets=k`` bounds it STRUCTURALLY, the same move as
``dedup.sparse_jaccard_pairs``' salted shingle chains: the point side
scatters each row to one of ``k`` salts (``pmod(xxhash64(all point
columns), k)``), the interval side replicates each covered bucket across
all ``k`` salts, and the equi-join keys on ``(bucket, salt)`` — so the
hottest possible task is ~1/k of the hot bucket at the cost of k-fold
interval-side replication (intervals are the small side by construction).
Exactness is unchanged: a point still owns exactly ONE (bucket, salt) and
the interval covers every salt of that bucket, so each pair appears at
most once.  Rows that are bit-identical across ALL point columns hash to
the same salt (deterministic by design — retries must re-derive the same
key); genuinely duplicated hot ROWS need a distinguishing id column,
which real tables have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__interval_bucket"
_SALT = "__interval_salt"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    salt_buckets: int = 1,
) -> DataFrame:
    """Inner-join ``points`` to every interval with ``lo <= point < hi``.

    Half-open semantics (``hi`` exclusive) so contiguous bands tile without
    double-counting boundary points.  Column names must not collide across
    the two inputs (same contract as a plain join).  NULL points / bounds
    drop out, as in SQL.

    ``salt_buckets > 1`` structurally bounds hot value buckets that sit
    below AQE's skew-split thresholds (module docstring): the join keys
    on ``(bucket, salt)`` with the interval side replicated across salts.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if salt_buckets < 1:
        raise ValueError(
            f"salt_buckets must be >= 1, got {salt_buckets}"
        )
    w = F.lit(float(bucket_width))
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / w).cast("long")
    )
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    keys = [_BUCKET]
    if salt_buckets > 1:
        p = p.withColumn(
            _SALT,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in points.columns]),
                F.lit(salt_buckets),
            ),
        )
        iv = iv.withColumn(
            _SALT,
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.lit(salt_buckets - 1).cast("long"),
                )
            ),
        )
        keys.append(_SALT)
    return (
        p.join(iv, keys)
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop(*keys)
    )
