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
    parts = sorted(glob.glob(f"{out}/part-*"))
    assert len(parts) == 1  # ordered mode coalesces to one file
    with open(parts[0], encoding="utf-8") as f:
        got = f.read().splitlines()
    want = [expected for _text, expected, _ in CASES]
    assert got == want


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
