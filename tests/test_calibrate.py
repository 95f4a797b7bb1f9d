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


def test_calibration_matches_local_quantiles(spark, decisions):
    """Grouped-map result == the same quantile computed locally (the grouped
    shuffle must not change the numbers)."""
    table = calibrate_thresholds(decisions).toPandas().set_index("lang")
    pdf = decisions.select("lang", "bits_per_char").toPandas()
    for lang, grp in pdf.groupby("lang"):
        expect = float(np.quantile(grp["bits_per_char"].to_numpy(), 0.95))
        assert abs(table.loc[lang, "bpc_p95"] - expect) < 1e-9
