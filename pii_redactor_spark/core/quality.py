"""Quality scoring: heuristic rules + a KenLM-style char-trigram perplexity.

The north-star pipeline pairs langid with "a KenLM-style n-gram perplexity
scorer" and "heuristic quality rules (length, repetition ratio, symbol
density, stop-word coverage)".  KenLM is unavailable here, so the perplexity
model is a hashed char-trigram language model with add-k smoothing, trained
deterministically at import time on the template corpus (``core.templates`` +
gazetteer vocabulary).  Scoring is fully vectorized with NumPy over whole
Arrow batches — one codepoint array per batch, rolling polynomial hashes,
``searchsorted`` lookups — no per-row Python in the hot path.

Keep/drop semantics: a caption is kept iff every heuristic passes and its
perplexity is under threshold.  PII presence does NOT drop a caption — PII is
scrubbed (quality-filter + scrub, not PII-filter).
"""

from __future__ import annotations

from collections.abc import Sequence
import itertools
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from . import generators as gen
from .templates import LANGUAGES, templates_for

# --- Shared flat codepoint batch --------------------------------------------
# One encode + separator cumsum serves the heuristics, the trigram LM, and
# langid (each used to build its own — three O(batch) passes for the same
# array).  Separator is NUL; payload NULs become \x01 (same is-symbol
# verdict, not a digit/letter/marker/space — every consumer's semantics are
# preserved; a literal \x01 payload byte was already indistinguishable from
# this mapping for all of them).


def flat_codes(texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """(codes: uint32 with 0 separators, text_id: per-position row index)."""
    joined = "\x00".join((t or "").replace("\x00", "\x01") for t in texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    return codes, np.cumsum(codes == 0)


# --- Trigram LM --------------------------------------------------------------
_P1 = np.uint64(1000003)
_ALPHA = 0.1


def _hash_trigrams(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rolling (bigram, trigram) hashes over a uint64 codepoint array."""
    c0, c1, c2 = codes[:-2], codes[1:-1], codes[2:]
    h2 = c1 * _P1 + c2
    h3 = (c0 * _P1 + c1) * _P1 + c2
    return h2, h3


def _build_training_corpus() -> str:
    """Deterministic in-domain corpus: filled templates + vocabulary."""
    rng = np.random.default_rng(20240716)
    parts: list[str] = []
    for lang in LANGUAGES:
        for template, etypes in templates_for(lang):
            for _ in range(3):
                context: dict[str, str] = {}
                text = template
                for etype in etypes:
                    value = gen.generate_value(rng, etype, lang, context)
                    context[etype] = value
                    text = text.replace("{%s}" % etype, value, 1)
                parts.append(text)
    return "\n".join(parts)


class TrigramLM:
    """Hashed char-trigram LM with add-k smoothing; vectorized batch scoring."""

    def __init__(self, corpus: str):
        codes = np.frombuffer(corpus.encode("utf-32-le"), dtype=np.uint32)
        codes = codes.astype(np.uint64)
        h2, h3 = _hash_trigrams(codes)
        self._h2_keys, self._h2_counts = self._tally(h2)
        self._h3_keys, self._h3_counts = self._tally(h3)
        self._vocab = max(len(np.unique(codes)), 1)

    @staticmethod
    def _tally(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(sorted keys + one trailing sentinel slot, counts + 0.0).

        The sentinel lets ``_lookup`` gather straight from
        ``searchsorted`` output with no clip: an out-of-range index (==
        len(keys)) lands on the sentinel, whose count is 0.0 — the miss
        value — so even a query equal to the sentinel key is correct."""
        keys, counts = np.unique(hashes, return_counts=True)
        return (
            np.append(keys, np.uint64(0)),
            np.append(counts.astype(np.float64), 0.0),
        )

    def _lookup(
        self, keys_ext: np.ndarray, counts_ext: np.ndarray,
        hashes: np.ndarray,
    ) -> np.ndarray:
        """Count per query hash (0.0 for misses) with minimal temporaries:
        one binary search over the (tiny, cache-resident) key array, two
        gathers, one in-place miss zeroing — no clip, no np.where."""
        n_keys = len(keys_ext) - 1
        if not n_keys:
            return np.zeros(len(hashes))
        idx = keys_ext[:n_keys].searchsorted(hashes)
        out = counts_ext[idx]
        out[keys_ext[idx] != hashes] = 0.0
        return out

    def bits_per_char(
        self,
        texts: Sequence[str],
        flat: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> np.ndarray:
        """Mean -log2 p(c3|c1c2) per text; vectorized over the whole batch.

        Uses the shared ``flat_codes`` array (payload NULs as \\x01 — a
        caption containing \\x00 would otherwise shift text-id alignment
        for the rest of the batch)."""
        n = len(texts)
        if n == 0:
            return np.zeros(0)
        codes32, text_id = flat if flat is not None else flat_codes(texts)
        codes = codes32.astype(np.uint64)
        if len(codes) < 3:
            return np.full(n, 20.0)
        h2, h3 = _hash_trigrams(codes)
        # A trigram is valid iff all 3 chars belong to the same text and none
        # is the separator.
        same = (text_id[:-2] == text_id[2:]) & (codes[:-2] != 0) & (
            codes[1:-1] != 0) & (codes[2:] != 0)
        c3 = self._lookup(self._h3_keys, self._h3_counts, h3)
        c2 = self._lookup(self._h2_keys, self._h2_counts, h2)
        logp = np.log2((c3 + _ALPHA) / (c2 + _ALPHA * self._vocab))
        tid = text_id[:-2]
        sums = np.bincount(tid[same], weights=-logp[same], minlength=n)
        cnts = np.bincount(tid[same], minlength=n)
        return np.where(cnts > 0, sums / np.maximum(cnts, 1), 20.0)


_LM: TrigramLM | None = None


def trigram_lm() -> TrigramLM:
    """Lazy per-process singleton (one build per executor worker)."""
    global _LM
    if _LM is None:
        _LM = TrigramLM(_build_training_corpus())
    return _LM


# --- Heuristic rules ---------------------------------------------------------
@dataclass(frozen=True)
class QualityConfig:
    min_chars: int = 12
    max_chars: int = 2000
    min_tokens: int = 3
    min_distinct_ratio: float = 0.3
    max_symbol_density: float = 0.30
    min_stopword_coverage: float = 0.0  # enforced only when tokens >= threshold
    stopword_check_min_tokens: int = 6
    # Measured on 3k template captions (max 5.31 bits/char) vs random-letter
    # gibberish (min 5.85): 5.6 splits the two populations cleanly.
    max_bits_per_char: float = 5.6
    flags_order: tuple[str, ...] = field(
        default=(
            "too_short", "too_long", "few_tokens", "repetitive",
            "symbol_heavy", "low_stopword", "high_perplexity",
        )
    )


DEFAULT_QUALITY = QualityConfig()

# Union of stopwords across supported languages, used for coverage only
# (language-specific scoring lives in core.langid).
from .langid import _STOPWORDS  # noqa: E402

_ALL_STOPWORDS = frozenset(
    w for words in _STOPWORDS.values() for w in words
) | frozenset(
    # High-frequency Hebrew function words appearing in the template corpus.
    ["שלי", "הוא", "היא", "אני", "עם", "של", "על", "או", "גם", "זה"]
)


# Lazy per-process is-symbol verdict table for the Basic Multilingual Plane
# (codepoint -> `not ch.isalnum() and not ch.isspace()`); index 0 is the
# batch separator and must never count.  One ~30 ms build per executor
# worker, then symbol counting is a pure table lookup + bincount — no
# per-batch np.unique sort.
_SYM_TABLE: np.ndarray | None = None
_TOKEN_STRIP = ".,!?:;()\"'"


def _sym_table() -> np.ndarray:
    global _SYM_TABLE
    if _SYM_TABLE is None:
        t = np.fromiter(
            (not chr(c).isalnum() and not chr(c).isspace()
             for c in range(0x10000)),
            dtype=bool, count=0x10000,
        )
        t[0] = False  # the join separator
        _SYM_TABLE = t
    return _SYM_TABLE


def heuristics_batch(
    texts: Sequence[str],
    cfg: QualityConfig = DEFAULT_QUALITY,
    flat: tuple[np.ndarray, np.ndarray] | None = None,
) -> dict[str, np.ndarray]:
    """Compute per-text heuristic metrics for a batch.

    Returns arrays: n_chars, n_tokens, distinct_ratio, symbol_density,
    stopword_coverage.  Fully vectorized and exactly equivalent to the
    per-row reference loop (`[w.strip(punct).lower() for w in t.split()]`
    etc.) — pinned by the batch==single property test.
    """
    n = len(texts)
    clean = [t or "" for t in texts]
    n_chars = np.fromiter(map(len, clean), np.int64, count=n)
    # Vectorized symbol counting over the shared flat codepoint array:
    # verdict via the per-process BMP lookup table (astral codepoints fall
    # back to an exact per-distinct check), then a per-text bincount.
    codes, text_id = flat if flat is not None else flat_codes(texts)
    if len(codes):
        bmp = np.minimum(codes, 0xFFFF)
        is_sym = _sym_table()[bmp]
        hi = codes > 0xFFFF
        if hi.any():
            hi_uniq = np.unique(codes[hi])
            hi_sym = {
                int(c): (not chr(c).isalnum() and not chr(c).isspace())
                for c in hi_uniq
            }
            is_sym[hi] = np.fromiter(
                (hi_sym[int(c)] for c in codes[hi]), dtype=bool,
                count=int(hi.sum()),
            )
        sym_counts = np.bincount(text_id[is_sym], minlength=n)
    else:
        sym_counts = np.zeros(n, dtype=np.int64)
    # Distinct-ratio + stopword coverage: factorize the flat raw-token
    # array, so strip/lower and stopword membership run once per DISTINCT
    # raw token (captions repeat vocabulary heavily), then per-row distinct
    # counts and stopword tallies become integer bincounts.
    toks_lists = [t.split() for t in clean]
    n_tokens = np.fromiter(map(len, toks_lists), np.int64, count=n)
    total = int(n_tokens.sum())
    distinct_ratio = np.ones(n)
    stopword_cov = np.zeros(n)
    if total:
        row = np.repeat(np.arange(n), n_tokens)
        flat_toks = np.fromiter(
            itertools.chain.from_iterable(toks_lists), dtype=object,
            count=total,
        )
        rcodes, runiq = pd.factorize(flat_toks)
        low = np.fromiter(
            (u.strip(_TOKEN_STRIP).lower() for u in runiq), dtype=object,
            count=len(runiq),
        )
        lcodes, luniq = pd.factorize(low)
        tok_l = lcodes[rcodes]
        # distinct lowered tokens per row: unique (row, lowered-code) pairs
        key = row * len(luniq) + tok_l
        d_counts = np.bincount(np.unique(key) // len(luniq), minlength=n)
        stop_mask = np.fromiter(
            (u in _ALL_STOPWORDS for u in luniq), dtype=bool,
            count=len(luniq),
        )
        stop_counts = np.bincount(
            row, weights=stop_mask[tok_l].astype(np.float64), minlength=n
        )
        has = n_tokens > 0
        denom = np.maximum(n_tokens, 1)
        distinct_ratio = np.where(has, d_counts / denom, 1.0)
        stopword_cov = np.where(has, stop_counts / denom, 0.0)
    symbol_density = np.where(
        n_chars > 0, sym_counts / np.maximum(n_chars, 1), 0.0
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "distinct_ratio": distinct_ratio,
        "symbol_density": symbol_density,
        "stopword_coverage": stopword_cov,
    }


def quality_flags_batch(
    texts: Sequence[str],
    cfg: QualityConfig = DEFAULT_QUALITY,
    flat: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[list[list[str]], np.ndarray, dict[str, np.ndarray]]:
    """Evaluate all quality rules over a batch.

    Returns (flags per text, bits_per_char array, heuristic metrics dict).
    A text is kept iff its flag list is empty.
    """
    if flat is None:
        flat = flat_codes(texts)
    m = heuristics_batch(texts, cfg, flat)
    bpc = trigram_lm().bits_per_char(texts, flat)
    fails = {
        "too_short": m["n_chars"] < cfg.min_chars,
        "too_long": m["n_chars"] > cfg.max_chars,
        "few_tokens": m["n_tokens"] < cfg.min_tokens,
        "repetitive": m["distinct_ratio"] < cfg.min_distinct_ratio,
        "symbol_heavy": m["symbol_density"] > cfg.max_symbol_density,
        "low_stopword": (
            (m["n_tokens"] >= cfg.stopword_check_min_tokens)
            & (m["stopword_coverage"] < cfg.min_stopword_coverage)
        ),
        "high_perplexity": bpc > cfg.max_bits_per_char,
    }
    flags = [
        [name for name in cfg.flags_order if fails[name][i]]
        for i in range(len(texts))
    ]
    return flags, bpc, m
