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
from dataclasses import dataclass, field

import numpy as np

from . import generators as gen
from .templates import LANGUAGES, templates_for

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
        keys, counts = np.unique(hashes, return_counts=True)
        return keys, counts.astype(np.float64)

    def _lookup(
        self, keys: np.ndarray, counts: np.ndarray, hashes: np.ndarray
    ) -> np.ndarray:
        idx = np.searchsorted(keys, hashes)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx_c] == hashes if len(keys) else np.zeros(len(hashes), bool)
        out = np.where(hit, counts[idx_c], 0.0)
        return out

    def bits_per_char(self, texts: Sequence[str]) -> np.ndarray:
        """Mean -log2 p(c3|c1c2) per text; vectorized over the whole batch."""
        n = len(texts)
        if n == 0:
            return np.zeros(0)
        # One flat codepoint array with text-id bookkeeping.  NUL is the
        # separator, so scrub NULs from payload text (else a caption
        # containing \x00 would shift the text-id alignment for the whole
        # remainder of the batch).
        joined = "\x00".join((t or "").replace("\x00", " ") for t in texts)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        codes = codes.astype(np.uint64)
        text_id = np.cumsum(codes == 0)  # separator increments id
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


def heuristics_batch(
    texts: Sequence[str], cfg: QualityConfig = DEFAULT_QUALITY
) -> dict[str, np.ndarray]:
    """Compute per-text heuristic metrics for a batch.

    Returns arrays: n_chars, n_tokens, distinct_ratio, symbol_density,
    stopword_coverage.
    """
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    distinct_ratio = np.ones(n)
    symbol_density = np.zeros(n)
    stopword_cov = np.zeros(n)
    # Vectorized symbol counting: one flat codepoint array for the batch,
    # an is-symbol verdict computed once per DISTINCT codepoint (batches
    # reuse a small alphabet), then a per-text bincount.  Exactly equivalent
    # to per-char `not ch.isalnum() and not ch.isspace()`.
    # payload NULs -> \x01: keeps separator alignment, and \x01 has the same
    # is-symbol verdict as \x00 (neither alnum nor space), so counts match
    # the per-char original exactly.
    joined = "\x00".join((t or "").replace("\x00", "\x01") for t in texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if len(codes):
        uniq, inv = np.unique(codes, return_inverse=True)
        is_sym = np.fromiter(
            (
                c != 0 and not chr(c).isalnum() and not chr(c).isspace()
                for c in uniq
            ),
            dtype=bool, count=len(uniq),
        )
        text_id = np.cumsum(codes == 0)
        sym_counts = np.bincount(
            text_id[is_sym[inv]], minlength=n
        ) if is_sym.any() else np.zeros(n, dtype=np.int64)
    else:
        sym_counts = np.zeros(n, dtype=np.int64)
    for i, text in enumerate(texts):
        t = text or ""
        n_chars[i] = len(t)
        toks = t.split()
        n_tokens[i] = len(toks)
        if toks:
            lowered = [w.strip(".,!?:;()\"'").lower() for w in toks]
            distinct_ratio[i] = len(set(lowered)) / len(toks)
            stopword_cov[i] = sum(w in _ALL_STOPWORDS for w in lowered) / len(toks)
        if t:
            symbol_density[i] = sym_counts[i] / len(t)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "distinct_ratio": distinct_ratio,
        "symbol_density": symbol_density,
        "stopword_coverage": stopword_cov,
    }


def quality_flags_batch(
    texts: Sequence[str], cfg: QualityConfig = DEFAULT_QUALITY
) -> tuple[list[list[str]], np.ndarray, dict[str, np.ndarray]]:
    """Evaluate all quality rules over a batch.

    Returns (flags per text, bits_per_char array, heuristic metrics dict).
    A text is kept iff its flag list is empty.
    """
    m = heuristics_batch(texts, cfg)
    bpc = trigram_lm().bits_per_char(texts)
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
