"""Deterministic language identification (he/en/es/fr/de).

The north-star pipeline calls for fastText langid; fastText is not installable
in this environment (SURVEY.md §7 hard-part 6), so this is a self-contained
classifier with the same decision API: script detection for Hebrew plus
stopword/diacritic scoring for the four Latin languages.  Batch-oriented:
``classify_batch`` takes a sequence of strings and returns parallel arrays of
(lang, confidence) — called from the Arrow-batched scrub UDF.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import numpy as np

LANGS = ["he", "en", "es", "fr", "de"]

_HEBREW_CHARS = re.compile(r"[א-ת]")

_STOPWORDS = {
    "en": ["the", "is", "my", "and", "i", "at", "or", "a", "in", "to", "of",
           "about", "with", "for", "on", "can", "you", "name", "was", "born"],
    "es": ["el", "la", "es", "mi", "y", "de", "en", "me", "soy", "con",
           "para", "las", "los", "una", "uso", "mucho", "número", "correo"],
    "fr": ["je", "le", "la", "est", "mon", "ma", "et", "de", "en", "les",
           "des", "une", "avec", "suis", "numéro", "adresse"],
    "de": ["ich", "ist", "und", "meine", "mein", "der", "die", "das", "mit",
           "von", "bin", "auf", "gerne", "arbeite", "name"],
}
_MARKERS = {
    "en": "",
    "es": "ñ¿¡",
    "fr": "çàèêâîôû",
    "de": "ßäöü",
}

# Vectorization note: `(?<![\w])(?:stopwords)(?![\w])` can only ever match a
# complete maximal \w-run (stopwords are all word chars, so any partial-run
# match fails a lookaround), and at most once per run — so the per-language
# count equals the number of \w-runs whose lowercase form is in that
# language's stopword set.  That turns 4 regex scans per row into one
# \w-run extraction + factorized set membership over DISTINCT tokens.
_WORD_RUN = re.compile(r"\w+")
_STOPSETS = {lang: frozenset(words) for lang, words in _STOPWORDS.items()}

# Marker chars as a codepoint -> per-language weight row; Hebrew block for
# the script score.  Built once at import (tiny: only the chars involved).
_LATIN_LANGS = LANGS[1:]
_MARKER_CODES: dict[int, int] = {}  # codepoint -> lang column index
for _j, _lang in enumerate(_LATIN_LANGS, start=1):
    for _ch in _MARKERS[_lang]:
        _MARKER_CODES[ord(_ch)] = _j
        _up = _ch.upper()
        # per-char uppercase only: 'ß'.upper() == 'SS' would otherwise
        # register plain ASCII 'S' as a German marker (+1.5 per 'S' — the
        # round-1 regex char class '[ßäöüSSÄÖÜ]' had exactly that defect)
        if len(_up) == 1:
            _MARKER_CODES[ord(_up)] = _j
_HE_LO, _HE_HI = ord("א"), ord("ת")
# sre's IGNORECASE equivalence classes that go beyond upper/lower pairs, for
# the codepoints a Latin stopword could contain.  Alias -> base; applied
# before .lower() so token membership matches what a
# `(?<![\w])(?:stopwords)(?![\w])` IGNORECASE scan would accept (the
# reference form is rebuilt and differentially checked in
# tests/test_core.py).  İ is special separately: str.lower('İ') is two
# codepoints ('i' + combining dot), so it must fold BEFORE lowering.
_SRE_FOLD = str.maketrans(
    {"İ": "i", "ı": "i", "ſ": "s", "K": "k", "Å": "å"}
)
# Import-time guard: every stopword codepoint whose sre IGNORECASE
# equivalence class is bigger than {ch, ch.upper(), ch.lower()} must have
# its aliases in _SRE_FOLD, or vectorized membership silently diverges from
# the regex semantics.  Bases of CPython sre_compile's Latin-relevant
# extra-equivalence classes:
_SRE_SPECIAL_BASES = {"i": "ıİ", "s": "ſ", "k": "K", "å": "Å"}
_FOLDED = {chr(k) for k in _SRE_FOLD}
for _w in (w for ws in _STOPWORDS.values() for w in ws):
    for _ch in _w:
        for _alias in _SRE_SPECIAL_BASES.get(_ch, ""):
            assert _alias in _FOLDED, (
                f"stopword char {_ch!r} has unhandled sre alias {_alias!r}"
            )


def classify_batch(
    texts: Sequence[str],
    flat: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (langs: array[str], confidence: array[float]) for a batch."""
    import itertools

    import pandas as pd

    n = len(texts)
    scores = np.zeros((n, len(LANGS)), dtype=np.float64)
    clean = [t or "" for t in texts]

    # script + marker scores from the shared flat codepoint array
    if flat is None:
        from .quality import flat_codes

        flat = flat_codes(texts)
    codes, text_id = flat
    if len(codes):
        he = (codes >= _HE_LO) & (codes <= _HE_HI)
        scores[:, 0] = 3.0 * np.bincount(text_id[he], minlength=n)
        if _MARKER_CODES:
            mk = np.isin(codes, np.fromiter(_MARKER_CODES, dtype=np.uint32))
            if mk.any():
                cols = np.fromiter(
                    (_MARKER_CODES[int(c)] for c in codes[mk]),
                    dtype=np.int64, count=int(mk.sum()),
                )
                np.add.at(scores, (text_id[mk], cols), 1.5)

    # stopword scores: factorize \w-runs, membership once per distinct token
    runs = [_WORD_RUN.findall(t) for t in clean]
    lens = np.fromiter(map(len, runs), np.int64, count=n)
    total_runs = int(lens.sum())
    if total_runs:
        row = np.repeat(np.arange(n), lens)
        flat = np.fromiter(itertools.chain.from_iterable(runs),
                           dtype=object, count=total_runs)
        tcodes, uniq = pd.factorize(flat)
        # sre's IGNORECASE differs from str.lower() on a few codepoints:
        # simple mapping 'İ'->'i' (str.lower gives two codepoints), plus
        # sre's explicit equivalence pairs 'ı'~'i' and 'ſ'~'s' — normalize
        # them so set membership matches the regex the loop form used.
        low = [u.translate(_SRE_FOLD).lower() for u in uniq]
        for j, lang in enumerate(_LATIN_LANGS, start=1):
            member = np.fromiter(
                (w in _STOPSETS[lang] for w in low), dtype=bool,
                count=len(low),
            )
            if member.any():
                scores[:, j] += 2.0 * np.bincount(
                    row, weights=member[tcodes].astype(np.float64),
                    minlength=n,
                )

    total = scores.sum(axis=1)
    best = scores.argmax(axis=1)
    conf = np.where(total > 0, scores[np.arange(n), best] / (total + 1e-9), 0.0)
    langs = np.where(total > 0, np.array(LANGS, dtype=object)[best], "und")
    return langs.astype(object), conf
