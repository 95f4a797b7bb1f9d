"""Newline-delimited text file source/sink — the reference's batch-file API.

Reproduces ``BatchProcessor.process_file``
(``/root/reference/src/inference.py:512-539``): read a text file, strip
each line, redact it, write the redacted lines back out.  The reference
loops line-by-line on one machine; here the same surface is
``spark.read.text -> one Arrow-vectorized redact UDF -> write.text``.

Unlike the full scrub stage, ``process_file`` only *redacts* — no
quality filtering, every line is emitted (inference.py:530-533) — so the
line UDF runs just detect -> classify -> splice.

Ordering: the reference preserves file line order.  ``ordered=True``
(default, parity mode) restores it by sorting on the read-order id and
writing a single part file — correct for the reference's single-file use
case.  At 100 TB a caller passes ``ordered=False``: the write stays fully
parallel and line order across part files is not meaningful (the usual
contract for distributed text corpora).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..core.classify import classify_entity
from ..core.detect import detect_spans
from ..core.redact import redact_typed
from ..operators.scrub import DEFAULT_SCRUB, ScrubConfig


def redact_lines(texts: list[str], cfg: ScrubConfig = DEFAULT_SCRUB) -> list[str]:
    """process_file's per-line work: strip, detect, classify, splice."""
    out: list[str] = []
    for t in texts:
        t = (t or "").strip()
        spans = detect_spans(t, cfg.confidence_threshold)
        typed = [(s, e, classify_entity(t[s:e])) for s, e, _k, _c in spans]
        out.append(redact_typed(t, typed, cfg.replacement, cfg.preserve_format))
    return out


def make_redact_line_udf(cfg: ScrubConfig = DEFAULT_SCRUB):
    @pandas_udf(StringType())
    def _impl(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield pd.Series(
                redact_lines(series.tolist(), cfg), dtype=object
            )

    return _impl.asNondeterministic()


def scrub_text_file(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    cfg: ScrubConfig = DEFAULT_SCRUB,
    ordered: bool = True,
) -> DataFrame:
    """Read ``input_path`` (newline-delimited), redact, write ``output_path``
    (a Spark text output directory).  Returns the written DataFrame."""
    lines = spark.read.text(input_path)
    redact = make_redact_line_udf(cfg)
    red = lines.select(
        F.monotonically_increasing_id().alias("_line"),
        redact(F.col("value")).alias("value"),
    )
    if ordered:
        # read.text partitions follow file offsets and the monotonic id is
        # ordered across them, so this restores exact input line order.
        out = red.orderBy("_line").select("value").coalesce(1)
    else:
        out = red.select("value")
    out.write.mode("overwrite").text(output_path)
    return out
