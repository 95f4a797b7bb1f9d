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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__interval_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join ``points`` to every interval with ``lo <= point < hi``.

    Half-open semantics (``hi`` exclusive) so contiguous bands tile without
    double-counting boundary points.  Column names must not collide across
    the two inputs (same contract as a plain join).  NULL points / bounds
    drop out, as in SQL.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
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
    return (
        p.join(iv, _BUCKET)
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop(_BUCKET)
    )
