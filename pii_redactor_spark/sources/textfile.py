"""Newline-delimited text file source/sink — the reference's batch-file API.

Reproduces ``BatchProcessor.process_file``
(``/root/reference/src/inference.py:512-539``): read a text file, strip
each line, redact it, write the redacted lines back out.  The reference
loops line-by-line on one machine; here the same surface is
``spark.read -> one Arrow-vectorized redact UDF -> write.text``.

Unlike the full scrub stage, ``process_file`` only *redacts* — no
quality filtering, every line is emitted (inference.py:530-533) — so the
line UDF runs just detect -> classify -> splice.

Encoding: ``process_file(encoding=...)`` (inference.py:512) is honored on
both sides.  UTF-8 uses the native text source/sink.  Any other charset
goes through the CSV source/sink configured as a pure line reader/writer
(single ``value`` column, quoting disabled, a control-char separator) —
the only built-in path that decodes/encodes a caller charset (the text
source silently ignores ``encoding`` on read AND write; verified
empirically on this Spark).  Two measured CSV-path limits, made explicit
instead of silent: (1) a payload line containing the \\x01 separator
byte would split — real text in a legacy charset does not contain it;
(2) univocity skips fully-empty rows on BOTH read and write, so blank
lines cannot round-trip through a non-UTF-8 file.  ``blank_lines``
controls that case: ``"error"`` (the default; meaningful for non-UTF-8
only) pre-scans the input JVM-side and raises before any work if a
blank/whitespace-only line exists; ``"drop"`` omits such lines under
EVERY encoding — the usual distributed-corpus contract — so the flag
behaves identically whatever charset is in play.  UTF-8 mode with the
default ``"error"`` preserves blank lines exactly (no error is raised;
the native text path round-trips them).  Non-ASCII-compatible charsets
(UTF-16/32, EBCDIC) are rejected loudly up front — split reads and the
blank-line probe assume single-byte newline framing, and accepting such
a codec would corrupt lines silently at split boundaries
(``_require_ascii_compatible``).

Ordering (``ordered=True``, the parity mode): output lines are globally
ordered by ``(input file name, read-order id)`` and written through a
RANGE-partitioned sink — partition ``i`` of ``repartitionByRange`` holds
an ascending key range and becomes part file ``part-0000i``, so
concatenating the part files in name order reproduces the input order
byte-for-byte while the write itself stays fully parallel (the round-2
``coalesce(1)`` single-task sink is gone).

The per-file order guarantee rests on how Spark packs read splits: all
non-tail splits of a file are exactly ``maxPartitionBytes`` and the
planner's sort-by-length-descending is stable (TimSort), so within one
file splits keep offset order (equal lengths preserve listing order; the
smaller tail sorts after).  ``monotonically_increasing_id`` is monotone
within each split, hence ``(file, id)`` is monotone in file offset.
Across MULTIPLE input files (a glob), "input order" is defined as files
in lexicographic name order — callers needing listing order should pass
files individually.  At 100 TB a caller passes ``ordered=False``: no
range shuffle at all, and line order across part files is not meaningful
(the usual contract for distributed text corpora).
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


def _is_utf8(encoding: str) -> bool:
    return encoding.replace("-", "").replace("_", "").upper() == "UTF8"


# ASCII canary: newline/CR framing bytes, the \x01 separator, and plain
# letters — the bytes the CSV line path and the blank-line probe depend on.
_ASCII_CANARY = "\r\nA z01\x01"


def _require_ascii_compatible(encoding: str) -> None:
    """Reject charsets the CSV line path cannot frame correctly.

    The non-UTF-8 read/write path and ``_raw_has_blank_line`` assume
    ASCII-compatible newline framing: one line per ``\\n`` byte, the
    ``\\x01`` separator byte never produced by payload re-encoding.  Wide
    charsets (UTF-16/32: multi-byte code units + BOM) and non-ASCII
    single-byte codecs (EBCDIC) break that silently — corrupt lines at
    split boundaries, missed blank-line errors — so they fail loudly here
    instead (round-3 advice).  The check is behavioral, not an allowlist:
    a codec qualifies iff it encodes the ASCII canary to the identical
    ASCII bytes (true for UTF-8, latin-1/ISO-8859-*, cp125x, KOI8,
    Shift_JIS/EUC-family ASCII planes; false for UTF-16/32, EBCDIC).
    """
    import codecs

    try:
        info = codecs.lookup(encoding)
    except LookupError as e:
        raise ValueError(f"unknown encoding {encoding!r}") from e
    try:
        ok = _ASCII_CANARY.encode(info.name) == _ASCII_CANARY.encode("ascii")
    except UnicodeError:
        ok = False
    if not ok:
        raise ValueError(
            f"encoding {encoding!r} is not ASCII-compatible: the "
            "charset-honoring line path relies on single-byte newline "
            "framing, which UTF-16/32-style wide or non-ASCII codecs "
            "violate (silent line corruption at split boundaries); "
            "re-encode the input as UTF-8 or a single-byte charset"
        )


def read_text_lines(
    spark: SparkSession, input_path: str, encoding: str = "UTF-8"
) -> DataFrame:
    """One ``value`` row per input line, decoded with ``encoding``.

    UTF-8 -> native text source.  Other charsets -> the CSV reader as a
    line reader (explicit one-column schema, quoting off, \\x01 sep):
    the CSV read path decodes ``encoding``; the text source silently
    ignores it on read (UTF-8 only).  Both paths split large files.
    """
    if _is_utf8(encoding):
        return spark.read.text(input_path)
    _require_ascii_compatible(encoding)
    return (
        spark.read.format("csv")
        .option("encoding", encoding)
        .option("sep", "\x01")
        .option("quote", "")
        .option("header", False)
        .schema("value string")
        .load(input_path)
        # whitespace-only lines survive as-is; FULLY empty lines are
        # skipped by univocity (see module docstring / blank_lines)
        .na.fill({"value": ""})
    )


# python str.strip() whitespace beyond Java's ASCII \s: Unicode separators
# (Zs/Zl/Zp), NEL, and the information-separator control block.
_BLANK_RE = r"^[\s\p{Z}\x85\x1C-\x1F]*$"


def _raw_has_blank_line(spark: SparkSession, input_path: str) -> bool:
    """Fully-empty lines are invisible after the CSV reader skips them, so
    probe the raw byte stream with the text source: newline framing is
    ASCII-compatible for every single-byte and UTF-8-family charset, so an
    empty raw line is an empty logical line regardless of how the payload
    bytes decode.  (UTF-16/32 corpora fall outside this probe.)"""
    raw = spark.read.text(input_path)
    return bool(raw.where(F.length("value") == 0).limit(1).count())


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
    encoding: str = "UTF-8",
    output_files: int | None = None,
    blank_lines: str = "error",
) -> DataFrame:
    """Read ``input_path`` (newline-delimited, ``encoding``), redact, write
    ``output_path`` (a Spark text output directory, same ``encoding``).

    ``ordered=True``: part files concatenated in name order are byte-equal
    to redacting the input in order (see module docstring for the
    multi-file contract); the write is range-partitioned across
    ``output_files`` (default: the session's default parallelism) part
    files, not a single task.  ``blank_lines``: ``"drop"`` omits blank/
    whitespace-only lines under every encoding; ``"error"`` (default)
    raises on them for non-UTF-8 encodings (which cannot round-trip
    them) and preserves them exactly under UTF-8 (module docstring).
    Returns the written DataFrame.
    """
    lines = read_text_lines(spark, input_path, encoding)
    if _is_utf8(encoding) and blank_lines == "drop":
        # uniform semantics across encodings: "drop" omits blank/
        # whitespace-only lines in UTF-8 mode too (the CSV charset path
        # drops them structurally; without this the job flag would
        # silently no-op under the default encoding)
        lines = lines.where(~F.col("value").rlike(_BLANK_RE))
    if not _is_utf8(encoding) and blank_lines == "error":
        # the CSV path cannot represent blank lines (module docstring);
        # fail loudly up front instead of silently dropping them.  The
        # reader already skipped fully-empty lines, so probing the decoded
        # lines for whitespace-only content catches both loss modes.
        if lines.where(
            F.col("value").rlike(_BLANK_RE)
        ).limit(1).count() or _raw_has_blank_line(spark, input_path):
            raise ValueError(
                "input contains blank/whitespace-only lines, which cannot "
                "round-trip through a non-UTF-8 text sink (the CSV "
                "charset path skips empty rows); pass blank_lines='drop' "
                "to omit them, or re-encode the input as UTF-8"
            )
    redact = make_redact_line_udf(cfg)
    keyed = lines.select(
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_line"),
        "value",
    )
    if ordered:
        # Shuffle FIRST, redact AFTER: repartitionByRange samples its child
        # to pick range boundaries, so putting the UDF below the shuffle
        # would evaluate the whole redaction twice (once for the sampling
        # pass, once for the real exchange — measured 2x).  Ordering is
        # preserved because the UDF is applied per-partition after the
        # range sort, as a narrow projection.
        n_out = output_files or spark.sparkContext.defaultParallelism
        out = (
            keyed.repartitionByRange(n_out, "_file", "_line")
            .sortWithinPartitions("_file", "_line")
            .select(redact(F.col("value")).alias("value"))
        )
    else:
        out = keyed.select(redact(F.col("value")).alias("value"))
    if _is_utf8(encoding):
        out.write.mode("overwrite").text(output_path)
    else:
        # the text sink ignores `encoding` (UTF-8 only); the CSV sink is
        # the built-in writer that honors a target charset — same
        # single-column line-writer configuration as the reader.  Empty
        # redacted lines are skipped by univocity (guarded above).
        (
            out.write.mode("overwrite")
            .format("csv")
            .option("encoding", encoding)
            .option("sep", "\x01")
            .option("quote", "")
            .option("escape", "")
            .save(output_path)
        )
    return out
