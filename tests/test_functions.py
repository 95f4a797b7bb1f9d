"""Scalar-function layer: JVM-side expression builders."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.functions import (
    bpe_ish_tokens,
    char_ngram_min_hash,
    cosine,
    distinct_ratio,
    dot,
    l2_norm,
    whitespace_tokens,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a b a c", [1.0, 2.0, 2.0], [2.0, 4.0, 4.0]),
         ("Hello, world 42!", [3.0, 0.0, 4.0], [0.0, 1.0, 0.0])],
        "text string, v1 array<double>, v2 array<double>",
    )


def test_vector_math(df):
    r = df.select(
        dot("v1", "v2").alias("d"),
        l2_norm(F.col("v1")).alias("n"),
        cosine(F.col("v1"), F.col("v2")).alias("c"),
    ).collect()
    assert r[0]["d"] == 1 * 2 + 2 * 4 + 2 * 4
    assert abs(r[0]["n"] - 3.0) < 1e-12
    assert abs(r[0]["c"] - 1.0) < 1e-12       # parallel vectors
    assert abs(r[1]["c"] - 0.0) < 1e-12       # orthogonal


def test_tokenizers(df):
    r = df.select(
        whitespace_tokens("text").alias("ws"),
        bpe_ish_tokens("text").alias("bpe"),
        distinct_ratio(whitespace_tokens("text")).alias("dr"),
    ).collect()
    assert r[0]["ws"] == ["a", "b", "a", "c"]
    assert r[0]["dr"] == 0.75
    assert r[1]["bpe"] == ["Hello", ",", "world", "42", "!"]


def test_char_fingerprint_deterministic(df):
    a = df.select(char_ngram_min_hash("text").alias("fp")).collect()
    b = df.select(char_ngram_min_hash("text").alias("fp")).collect()
    assert [r["fp"] for r in a] == [r["fp"] for r in b]
    with pytest.raises(ValueError):
        char_ngram_min_hash(F.col("text"))


def test_char_ngram_min_hash_guards_short_text(spark):
    from pii_redactor_spark.functions import char_ngram_min_hash

    df = spark.createDataFrame(
        [("exactly8", ), ("short", ), ("", ), (None, ),
         ("longer than eight", )], "text string",
    )
    got = df.select(char_ngram_min_hash("text", 8).alias("fp")).collect()
    assert got[0]["fp"] is not None        # len == n: one window
    assert got[1]["fp"] is None            # len < n: NULL, not garbage
    assert got[2]["fp"] is None
    assert got[3]["fp"] is None
    assert got[4]["fp"] is not None
