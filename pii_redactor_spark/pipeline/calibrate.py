"""Per-language threshold calibration — the engine's grouped-map operator.

The trigram-LM perplexity threshold (`QualityConfig.max_bits_per_char`) is
global; real corpora want it per language (Hebrew text scores differently
from English under one shared LM).  This module computes per-language
calibration tables with ``groupBy().applyInPandas`` — Spark's grouped-map
shape: each language group arrives as one pandas DataFrame, NumPy computes
quantiles, one summary row leaves.  At 10^12 rows the group count (languages)
is tiny while groups are huge, so this runs as one shuffle keyed on ``lang``
with Arrow-batched group streaming — no driver collect.

(The reference has no analog — its config thresholds are static YAML,
``config.yaml:1-62``; this is a scale-tier addition, same family as A4/A5
benchmark statistics in SURVEY.md §2.4.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

CALIBRATION_SCHEMA = (
    "lang string, n_rows long, bpc_p50 double, bpc_p95 double, "
    "bpc_p99 double, suggested_max_bpc double, chars_p50 double, "
    "chars_p95 double"
)


def _calibrate_group(pdf: pd.DataFrame) -> pd.DataFrame:
    bpc = pdf["bits_per_char"].to_numpy(dtype=np.float64)
    chars = pdf["n_chars"].to_numpy(dtype=np.float64)
    p50, p95, p99 = np.quantile(bpc, [0.5, 0.95, 0.99])
    return pd.DataFrame(
        [{
            "lang": pdf["lang"].iloc[0],
            "n_rows": len(pdf),
            "bpc_p50": float(p50),
            "bpc_p95": float(p95),
            "bpc_p99": float(p99),
            # keep ~95% of in-language mass, with headroom below p99 junk
            "suggested_max_bpc": float(p95 + 0.5 * (p99 - p95)),
            "chars_p50": float(np.quantile(chars, 0.5)),
            "chars_p95": float(np.quantile(chars, 0.95)),
        }]
    )


def calibrate_thresholds(decisions: DataFrame) -> DataFrame:
    """Per-language quality-threshold table from a decisions DataFrame
    (needs columns: lang, bits_per_char, n_chars)."""
    return (
        decisions.select("lang", "bits_per_char", "n_chars")
        .groupBy("lang")
        .applyInPandas(_calibrate_group, schema=CALIBRATION_SCHEMA)
    )
