"""interval_join: exact point-in-interval pairs via bucket quantization,
differentially checked against the brute-force theta join, with the plan
pinned free of nested-loop/cartesian nodes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.operators.intervals import interval_join


@pytest.fixture(scope="module")
def pts_iv(spark):
    rng = np.random.default_rng(7)
    pts = spark.createDataFrame(
        [(int(i), float(v)) for i, v in
         enumerate(rng.uniform(-100, 300, 800))],
        "pid long, value double",
    )
    lo = rng.uniform(-120, 280, 60)
    # mixed interval lengths: sub-bucket up to many-bucket spans
    hi = lo + rng.uniform(0.5, 120, 60)
    iv = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in
         enumerate(zip(lo, hi))],
        "iid long, lo double, hi double",
    )
    return pts, iv


def _pairs(df):
    return {(r.pid, r.iid) for r in df.select("pid", "iid").collect()}


@pytest.mark.parametrize("width", [7.0, 25.0, 200.0])
def test_matches_brute_force(spark, pts_iv, width):
    pts, iv = pts_iv
    got = _pairs(interval_join(pts, iv, "value", "lo", "hi", width))
    want = _pairs(
        pts.crossJoin(iv).where(
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
        )
    )
    assert got == want and len(want) > 100  # non-trivial corpus


def test_no_duplicate_pairs(spark, pts_iv):
    pts, iv = pts_iv
    j = interval_join(pts, iv, "value", "lo", "hi", 10.0)
    assert j.count() == j.select("pid", "iid").distinct().count()


def test_half_open_boundaries(spark):
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid long, value double")
    iv = spark.createDataFrame([(1, 10.0, 20.0)], "iid long, lo double, hi double")
    got = _pairs(interval_join(pts, iv, "value", "lo", "hi", 5.0))
    assert got == {(1, 1)}  # lo inclusive, hi exclusive


def test_plan_has_no_cartesian(spark, pts_iv):
    pts, iv = pts_iv
    j = interval_join(pts, iv, "value", "lo", "hi", 25.0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_rejects_bad_width(spark, pts_iv):
    pts, iv = pts_iv
    with pytest.raises(ValueError):
        interval_join(pts, iv, "value", "lo", "hi", 0)
