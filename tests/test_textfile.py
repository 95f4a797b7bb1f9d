"""Text-line file source/sink (reference process_file parity)."""

from __future__ import annotations

import glob

from pii_redactor_spark.core.reference_impl import scrub_text
from pii_redactor_spark.operators.scrub import ScrubConfig
from pii_redactor_spark.sources.textfile import redact_lines, scrub_text_file

from tests.test_reference_parity import CASES


def test_round_trip_byte_equality_on_reference_corpus(spark, tmp_root):
    """process_file semantics end-to-end: write the 17-text corpus as a
    file, scrub through Spark, read back — every line byte-equal to the
    reference scrubbed output, in original order."""
    inp = f"{tmp_root}/corpus_in.txt"
    out = f"{tmp_root}/corpus_out"
    with open(inp, "w", encoding="utf-8") as f:
        for text, _expected, _ in CASES:
            f.write(text + "\n")
    scrub_text_file(spark, inp, out)
    got = _concat_parts(out).splitlines()
    want = [expected for _text, expected, _ in CASES]
    assert got == want


def _concat_parts(out_dir: str, encoding: str = "utf-8") -> str:
    """Ordered-mode contract: part files concatenated in name order ARE the
    output file."""
    parts = sorted(glob.glob(f"{out_dir}/part-*"))
    assert parts
    return "".join(
        open(p, encoding=encoding).read() for p in parts
    )


def test_ordered_distributed_sink_multi_partition_byte_equal(spark, tmp_root):
    """Order-preserving DISTRIBUTED sink: a file large enough to split into
    many read partitions, written through >1 range partition — the
    name-ordered concatenation must be byte-equal to redacting in input
    order (no coalesce(1) single-task sink)."""
    inp = f"{tmp_root}/big_in.txt"
    out = f"{tmp_root}/big_out"
    lines = [f"row {i:06d} mail{i}@x.co padding {'x' * (i % 37)}"
             for i in range(5000)]
    with open(inp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        scrub_text_file(spark, inp, out, output_files=6)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    parts = sorted(glob.glob(f"{out}/part-*"))
    non_empty = [p for p in parts if open(p, "rb").read()]
    assert len(non_empty) > 1  # genuinely distributed write
    want = "".join(scrub_text(l.strip()).scrubbed + "\n" for l in lines)
    assert _concat_parts(out) == want


def test_ordered_multi_file_glob_lexicographic(spark, tmp_root):
    """Multi-file input: output order is files in lexicographic name
    order, each file's lines in offset order — including files of
    different sizes (the split-packing case the advisor flagged)."""
    import os

    d = f"{tmp_root}/multi_in"
    os.makedirs(d, exist_ok=True)
    files = {
        "a_small.txt": [f"alpha {i} a{i}@x.co" for i in range(5)],
        "b_large.txt": [f"beta {i} b{i}@x.co extra padding here {'y' * 40}"
                        for i in range(800)],
        "c_mid.txt": [f"gamma {i}" for i in range(50)],
    }
    for name, lines in files.items():
        with open(os.path.join(d, name), "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
    out = f"{tmp_root}/multi_out"
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        scrub_text_file(spark, d, out, output_files=4)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    want = "".join(
        scrub_text(l.strip()).scrubbed + "\n"
        for name in sorted(files)
        for l in files[name]
    )
    assert _concat_parts(out) == want


def test_encoding_latin1_round_trip(spark, tmp_root):
    """process_file(encoding=...) parity (reference inference.py:512):
    latin-1 in, latin-1 out, redaction applied, order preserved."""
    inp = f"{tmp_root}/latin_in.txt"
    out = f"{tmp_root}/latin_out"
    lines = [
        "café owner María, mail cafe@muenchen.de",
        "naïve line with no pii ä ö ü",
        "l'été à Paris, tél 01-23-45-67-89",
    ]
    with open(inp, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode("latin-1"))
    scrub_text_file(spark, inp, out, encoding="ISO-8859-1")
    want = "".join(scrub_text(l.strip()).scrubbed + "\n" for l in lines)
    got = _concat_parts(out, encoding="latin-1")
    assert got == want
    assert "[EMAIL_REDACTED]" in got  # redaction really ran


def test_non_ascii_compatible_encodings_rejected(spark, tmp_root):
    """Round-3 advice: UTF-16/32 (wide code units) and EBCDIC (non-ASCII
    single-byte) break the CSV line path's newline framing — they must
    fail loudly up front, never silently corrupt lines at split
    boundaries.  ASCII-compatible charsets keep working."""
    import pytest

    from pii_redactor_spark.sources.textfile import (
        _require_ascii_compatible,
        read_text_lines,
    )

    inp = f"{tmp_root}/wide_in.txt"
    with open(inp, "wb") as f:
        f.write("hello\nworld\n".encode("utf-16"))
    for bad in ("UTF-16", "utf-32", "UTF-16LE", "cp500"):
        with pytest.raises(ValueError, match="ASCII-compatible"):
            read_text_lines(spark, inp, encoding=bad)
        with pytest.raises(ValueError, match="ASCII-compatible"):
            scrub_text_file(spark, inp, f"{tmp_root}/wide_out",
                            encoding=bad)
    with pytest.raises(ValueError, match="unknown encoding"):
        _require_ascii_compatible("no-such-charset")
    # the single-byte / UTF-8-family allow side stays open
    for ok in ("ISO-8859-1", "latin-1", "cp1252", "koi8-r", "shift_jis"):
        _require_ascii_compatible(ok)


def test_encoding_blank_lines_error_and_drop(spark, tmp_root):
    """Blank lines cannot round-trip through the non-UTF-8 CSV charset
    path (univocity skips empty rows on read AND write) — default is a
    loud error; blank_lines='drop' opts into omitting them."""
    import pytest

    inp = f"{tmp_root}/latin_blank_in.txt"
    out = f"{tmp_root}/latin_blank_out"
    lines = ["première ligne", "", "dernière ligne tél 01-23-45-67-89"]
    with open(inp, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode("latin-1"))
    with pytest.raises(ValueError, match="blank"):
        scrub_text_file(spark, inp, out, encoding="ISO-8859-1")
    scrub_text_file(
        spark, inp, out, encoding="ISO-8859-1", blank_lines="drop"
    )
    want = "".join(
        scrub_text(l.strip()).scrubbed + "\n" for l in lines if l.strip()
    )
    assert _concat_parts(out, encoding="latin-1") == want
    # UTF-8 mode is unaffected: blank lines round-trip exactly
    inp8 = f"{tmp_root}/utf8_blank_in.txt"
    out8 = f"{tmp_root}/utf8_blank_out"
    with open(inp8, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    scrub_text_file(spark, inp8, out8)
    want8 = "".join(scrub_text(l.strip()).scrubbed + "\n" for l in lines)
    assert _concat_parts(out8) == want8


def test_redact_lines_strips_like_reference():
    """process_file calls redact(line.strip()) — inference.py:530-533."""
    got = redact_lines(["  a@b.co  ", "\tno pii here\t", ""])
    assert got == ["[EMAIL_REDACTED]", "no pii here", ""]


def test_textfile_config_plumbs_through(spark, tmp_root):
    inp = f"{tmp_root}/cfg_in.txt"
    out = f"{tmp_root}/cfg_out"
    with open(inp, "w", encoding="utf-8") as f:
        f.write("My name is John Smith, ID 123-45-6789\n")
    scrub_text_file(
        spark, inp, out,
        ScrubConfig(replacement="<PII>", preserve_format=False),
    )
    part = sorted(glob.glob(f"{out}/part-*"))[0]
    with open(part, encoding="utf-8") as f:
        assert f.read().splitlines() == ["My name is <PII>, ID <PII>"]


def test_unordered_mode_same_multiset(spark, tmp_root):
    inp = f"{tmp_root}/uo_in.txt"
    out = f"{tmp_root}/uo_out"
    lines = [f"line {i} mail{i}@x.co" for i in range(200)]
    with open(inp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    scrub_text_file(spark, inp, out, ordered=False)
    got = sorted(spark.read.text(out).toPandas()["value"])
    want = sorted(scrub_text(l).scrubbed for l in lines)
    assert got == want
