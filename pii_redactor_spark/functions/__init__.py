"""Reusable Column-expression builders — the engine's scalar-function layer.

Everything here is a JVM-side expression factory (no UDFs): vector math via
higher-order array functions, text shingling/tokenization, hashing.  The
driver-contract queries inline equivalent expressions for SQL-oracle parity;
pipelines compose these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import minhash_signature, with_shingles  # noqa: F401
from ..operators.similarity import cosine, dot  # noqa: F401
from .toxicity import (  # noqa: F401
    mask_toxic,
    toxic_hits,
    toxicity_score,
    with_toxicity,
)


def l2_norm(v: Column) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(dot(v, v))


def whitespace_tokens(text: Column | str) -> Column:
    return F.split(text, " ")


def bpe_ish_tokens(text: Column | str) -> Column:
    """Letter runs / digit runs / single punctuation — the BPE-ish token
    proxy used for token counting (SURVEY.md training-data ops)."""
    return F.regexp_extract_all(
        text if isinstance(text, Column) else F.col(text),
        F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"),
        0,
    )


def char_ngram_min_hash(text: Column | str, n: int = 8) -> Column:
    """Rolling char-n-gram bottom-1 fingerprint (winnowing sketch).

    NULL for texts shorter than ``n`` chars: without the guard,
    ``sequence(1, len-n+1)`` would run descending and substring() with
    non-positive positions would fingerprint unintended end-relative
    substrings."""
    if not isinstance(text, str):
        raise ValueError("pass a column NAME for char_ngram_min_hash")
    c = text
    return F.when(
        F.expr(f"char_length({c}) >= {n}"),
        F.expr(
            f"array_min(transform(sequence(1, char_length({c}) - {n - 1}), "
            f"i -> md5(substring({c}, i, {n}))))"
        ),
    ).otherwise(F.lit(None))


def distinct_ratio(tokens: Column) -> Column:
    """Repetition heuristic: distinct tokens / tokens."""
    return F.size(F.array_distinct(tokens)) / F.size(tokens)
