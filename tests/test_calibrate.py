"""Grouped-map calibration operator (applyInPandas)."""

from __future__ import annotations

import numpy as np
import pytest

from pii_redactor_spark.fixtures.captions import CaptionConfig
from pii_redactor_spark.fixtures.images import write_fixture_tables
from pii_redactor_spark.pipeline.calibrate import calibrate_thresholds
from pii_redactor_spark.pipeline.run import scrub_decisions


@pytest.fixture(scope="module")
def decisions(spark, tmp_root):
    path, _ = write_fixture_tables(
        spark, f"{tmp_root}/calib_fx", 800, CaptionConfig(), partitions=8
    )
    return scrub_decisions(spark.read.parquet(path)).cache()


def test_calibration_table_shape_and_bounds(spark, decisions):
    table = calibrate_thresholds(decisions).toPandas()
    assert set(table["lang"]) >= {"he", "en"}
    assert (table["n_rows"] > 0).all()
    assert int(table["n_rows"].sum()) == 800
    # quantiles ordered, suggestion between p95 and p99
    assert (table["bpc_p50"] <= table["bpc_p95"]).all()
    assert (table["bpc_p95"] <= table["bpc_p99"]).all()
    assert (
        (table["suggested_max_bpc"] >= table["bpc_p95"])
        & (table["suggested_max_bpc"] <= table["bpc_p99"] + 1e-9)
    ).all()


def test_sketched_calibration_matches_exact_within_bin(spark, decisions):
    from pii_redactor_spark.pipeline.calibrate import (
        calibrate_thresholds_sketched,
    )

    exact = calibrate_thresholds(decisions).toPandas().set_index("lang")
    sk = calibrate_thresholds_sketched(decisions).toPandas().set_index("lang")
    bin_w = 20.0 / 2048
    assert set(sk.index) == set(exact.index)
    pdf = decisions.select("lang", "bits_per_char").toPandas()
    for lang, grp in pdf.groupby("lang"):
        assert sk.loc[lang, "n_rows"] == exact.loc[lang, "n_rows"]
        vals = grp["bits_per_char"].to_numpy(dtype=float)
        for q, col in ((0.5, "bpc_p50"), (0.95, "bpc_p95"),
                       (0.99, "bpc_p99")):
            # the sketch's target is the order-statistic quantile (smallest
            # x with CDF >= q), reported as its bin's upper edge: within one
            # bin above it.  (np.quantile's default interpolation can sit
            # many bins away in a sparse tail — not the comparison point.)
            target = float(np.quantile(vals, q, method="inverted_cdf"))
            diff = sk.loc[lang, col] - target
            assert -1e-9 <= diff <= bin_w + 1e-9, (lang, col, diff)


def test_sketched_calibration_has_no_python_nodes(spark, decisions):
    """The skew-immune path must be pure hash aggregates + window — the
    whole point is avoiding the one-task-per-group grouped map."""
    from pii_redactor_spark.pipeline.calibrate import (
        calibrate_thresholds_sketched,
    )
    from pii_redactor_spark.plans import python_udf_nodes

    # fresh source (the fixture's plan carries the upstream scrub UDF in its
    # lineage) — only the calibration stage's own nodes matter here
    src = spark.createDataFrame(
        [("en", 3.2), ("he", 4.1), ("en", 5.0)],
        "lang string, bits_per_char double",
    )
    assert python_udf_nodes(calibrate_thresholds_sketched(src)) == 0


def test_calibration_matches_local_quantiles(spark, decisions):
    """Grouped-map result == the same quantile computed locally (the grouped
    shuffle must not change the numbers)."""
    table = calibrate_thresholds(decisions).toPandas().set_index("lang")
    pdf = decisions.select("lang", "bits_per_char").toPandas()
    for lang, grp in pdf.groupby("lang"):
        expect = float(np.quantile(grp["bits_per_char"].to_numpy(), 0.95))
        assert abs(table.loc[lang, "bpc_p95"] - expect) < 1e-9
