"""Entity span detection — the rules engine replacing the reference's model.

The reference detects PII with a fine-tuned DistilBERT token classifier
(``/root/reference/src/inference.py:215-253``).  Per the project brief, our
engine replaces the model with deterministic rules: compiled regex for
structured PII and gazetteer alternations for names/addresses
(``core.patterns.COMPILED_DETECT`` + ``core.gazetteers.GAZETTEER_PATTERNS``).

Output mirrors the reference's span contract: ``(start, end)`` character
offsets into the original text, non-overlapping, sorted by start.  Overlaps
are resolved longest-span-wins (ties: bank order), matching the intuition of
the reference's BIO decoding where one token belongs to exactly one entity
(``src/inference.py:283-354``).

Confidence: the reference's ``PIIEntity`` carries a per-span ``confidence``
(min over token probabilities, ``src/inference.py:34-52,338``) and spans
below ``confidence_threshold`` (default 0.5) are dropped before assembly
(``src/inference.py:313-318``).  A rules detector has no logits, so the
analog is *pattern specificity*: how unlikely the pattern is to fire on
non-PII text.  Fully-structured formats (e-mail, SSN, credit card) score
high; ambiguous shapes (bare 9-digit runs, generic dates) score low; the
gazetteer banks sit between (exact-vocabulary match, but common words can
collide).  All defaults are >= 0.5 so the reference-parity corpus is
byte-identical at the default threshold; raising the threshold trades
recall for precision exactly as in the reference.
"""

from __future__ import annotations

import re

from .gazetteers import (
    GAZETTEER_PATTERNS,
    HE_ADDRESS_PATTERN,
    HE_NAME_PATTERN,
    LATIN_ADDRESS_PATTERN,
    LATIN_NAME_PATTERN,
)
from .patterns import COMPILED_DETECT

DEFAULT_CONFIDENCE_THRESHOLD = 0.5  # reference: inference.py:68

# Pattern-specificity scores for the structured bank, keyed by the exact
# pattern string (every DETECT_STRUCTURED entry must appear; import-time
# assert below).  Scale: ~1.0 = the pattern essentially never fires on
# non-PII text, ~0.6 = plausible false positives exist.
_STRUCTURED_CONFIDENCE: dict[str, float] = {
    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b": 0.99,  # EMAIL
    r"\b\d{3}-\d{3}-\d{4}\b": 0.95,           # PHONE 3-3-4
    r"\(\d{3}\)\s?\d{3}-\d{4}": 0.97,         # PHONE (area) 3-4
    r"\+\d{1,3}[-.\s]?\d{6,14}\b": 0.90,      # PHONE intl
    r"\b0\d{1,2}-\d{7,8}\b": 0.92,            # PHONE IL
    r"\b\d{2}-\d{3}-\d{4}\b": 0.88,           # PHONE EU 2-3-4
    r"\b\d{2}(?:-\d{2}){4}\b": 0.92,          # PHONE FR pairs
    r"\b\d{3}-\d{2}-\d{4}\b": 0.95,           # SSN
    r"\b\d{9}\b": 0.65,                       # bare 9 digits (ambiguous)
    r"\b\d{4}[-\s]\d{4}[-\s]\d{4}[-\s]\d{4}\b": 0.97,       # credit card
    r"\*{4}[-\s]?\*{4}[-\s]?\*{4}[-\s]?\d{4}\b": 0.99,      # masked card
    r"\b[A-Z]{2}\d{7}\b": 0.85,               # passport
    r"\b[A-Z]{2}\d{14}\b": 0.90,              # IBAN-like
    r"\b\d{2}-\d{3}-\d{6}\b": 0.90,           # IL bank account
    r"\b\d{3}-\d{2}-\d{3}\b": 0.85,           # plate 3-2-3
    r"\b\d{2}-\d{3}-\d{2}\b(?!-)": 0.85,      # plate 2-3-2
    r"\b[A-Z]{2}\d{3}[A-Z]{2}\b": 0.85,       # EU plate
    r"\b\d{1,2}[/.\-]\d{1,2}[/.\-]\d{2,4}\b": 0.70,  # date (often non-PII)
}
# The Hebrew-month date is appended programmatically; give it the same score
# as the numeric date.
_DATE_HE_CONFIDENCE = 0.70
_GAZ_CONFIDENCE = {
    "ADDRESS": 0.90,  # number + street + city from gazetteer: very specific
    "NAME": 0.80,     # exact vocabulary pair, but names are common words
}

_HAS_DIGIT = re.compile(r"\d").search
_HAS_UPPER = re.compile(r"[A-Z]").search
_HAS_HEBREW = re.compile(r"[א-ת]").search

# Exact prefilters: each guard names a character class the pattern cannot
# match without (mandatory \d, literal '@', every name alternative starting
# with an ASCII capital / a Hebrew letter).  A guard can only skip scans
# that provably cannot match, so results are byte-identical — the common
# clean-caption case just skips most of the 23 regex scans (measured 3.2x).
# Bank iteration order (ADDRESS->NAME gazetteers, then EMAIL, then the digit
# patterns in COMPILED_DETECT order) is preserved: `order` tiebreaks equal-
# length overlaps, and a skipped bank contributes no candidates anyway.
def _confidence_for(pattern: re.Pattern) -> float:
    if pattern.pattern in _STRUCTURED_CONFIDENCE:
        return _STRUCTURED_CONFIDENCE[pattern.pattern]
    return _DATE_HE_CONFIDENCE  # the appended Hebrew-month date pattern


_DETECT_DIGIT = [(t, p, _confidence_for(p))
                 for t, p in COMPILED_DETECT if t != "EMAIL"]
_DETECT_EMAIL = [(t, p, _confidence_for(p))
                 for t, p in COMPILED_DETECT if t == "EMAIL"]
assert all("\\d" in p.pattern or re.search(r"\d", p.pattern)
           for _, p, _c in _DETECT_DIGIT)
# Every structured pattern must have an explicit confidence (the Hebrew-date
# fallback applies to exactly one programmatically-built pattern).
assert sum(1 for _, p in COMPILED_DETECT
           if p.pattern not in _STRUCTURED_CONFIDENCE) == 1

# Pin the gazetteer bank order the positional guards below assume (the guard
# table would silently mispair if GAZETTEER_PATTERNS were reordered/extended).
assert [p for _, p in GAZETTEER_PATTERNS] == [
    HE_ADDRESS_PATTERN, LATIN_ADDRESS_PATTERN,
    HE_NAME_PATTERN, LATIN_NAME_PATTERN,
], "GAZETTEER_PATTERNS order changed — update _GAZ_GUARDS to match"

_GAZ_GUARDS = {
    # both address grammars contain a mandatory house number
    0: lambda t: _HAS_HEBREW(t) and _HAS_DIGIT(t),   # HE_ADDRESS
    1: lambda t: _HAS_UPPER(t) and _HAS_DIGIT(t),    # LATIN_ADDRESS
    2: _HAS_HEBREW,                                   # HE_NAME
    3: _HAS_UPPER,                                    # LATIN_NAME
}

# Bank tuple per (hebrew, upper, digit, at) guard combination, built once —
# detect_spans runs per row inside the Arrow UDF, so assembling the bank
# list must not allocate per call.  Semantics identical to evaluating the
# guards inline (the table is indexed by exactly the guard predicates).
_GAZ = [(t, p, _GAZ_CONFIDENCE[t]) for t, p in GAZETTEER_PATTERNS]
_BANKS_BY_FLAGS = {}
for _he in (False, True):
    for _up in (False, True):
        for _dig in (False, True):
            for _at in (False, True):
                _flags = {0: _he and _dig, 1: _up and _dig, 2: _he, 3: _up}
                _banks = [_GAZ[_i] for _i in range(4) if _flags[_i]]
                if _at:
                    _banks += _DETECT_EMAIL
                if _dig:
                    _banks += _DETECT_DIGIT
                _BANKS_BY_FLAGS[(_he, _up, _dig, _at)] = tuple(_banks)


_DIGIT_TABLE = None


def _digit_table():
    """Lazy BMP table for the `\\d` (Unicode Nd) guard — built with the
    guard regex itself so the verdicts are identical by construction."""
    global _DIGIT_TABLE
    if _DIGIT_TABLE is None:
        import numpy as np

        _DIGIT_TABLE = np.fromiter(
            (_HAS_DIGIT(chr(c)) is not None for c in range(0x10000)),
            dtype=bool, count=0x10000,
        )
    return _DIGIT_TABLE


def guard_flags_batch(n: int, codes, text_id) -> list[tuple[bool, bool, bool, bool]]:
    """Per-text guard flags for a whole batch from the shared flat
    codepoint array (``core.quality.flat_codes``): four bincount presence
    checks instead of four regex scans per row."""
    import numpy as np

    if not len(codes):
        return [(False, False, False, False)] * n

    def present(mask):
        return np.bincount(text_id[mask], minlength=n) > 0

    he = present((codes >= 0x05D0) & (codes <= 0x05EA))
    up = present((codes >= 65) & (codes <= 90))
    at = present(codes == 64)
    dig_mask = _digit_table()[np.minimum(codes, 0xFFFF)]
    hi = codes > 0xFFFF
    if hi.any():
        verd = {int(c): _HAS_DIGIT(chr(c)) is not None
                for c in np.unique(codes[hi])}
        dig_mask[hi] = np.fromiter(
            (verd[int(c)] for c in codes[hi]), dtype=bool,
            count=int(hi.sum()),
        )
    dig = present(dig_mask)
    return [
        (bool(h), bool(u), bool(d), bool(a))
        for h, u, d, a in zip(he, up, dig, at)
    ]


def guard_flags(text: str) -> tuple[bool, bool, bool, bool]:
    """(hebrew, ascii-upper, digit, '@') prefilter flags for one text.
    ``scrub_batch`` computes the same four flags for a whole Arrow batch
    from the shared codepoint array instead (one vectorized pass)."""
    return (
        bool(_HAS_HEBREW(text)), bool(_HAS_UPPER(text)),
        bool(_HAS_DIGIT(text)), "@" in text,
    )


def detect_spans(
    text: str,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    flags: tuple[bool, bool, bool, bool] | None = None,
) -> list[tuple[int, int, str, float]]:
    """Find all PII spans in ``text``.

    Returns a list of ``(start, end, entity_type, confidence)`` with no
    overlaps, sorted by start offset.  Candidates below
    ``confidence_threshold`` are dropped before overlap resolution,
    mirroring the reference's low-confidence token skip
    (``src/inference.py:313-318``).
    """
    if not text:
        return []

    banks = _BANKS_BY_FLAGS[flags if flags is not None else guard_flags(text)]
    if not banks:
        return []

    # (start, -len, order, type, conf)
    candidates: list[tuple[int, int, int, str, float]] = []
    order = 0
    for etype, pattern, conf in banks:
        if conf < confidence_threshold:
            continue
        for m in pattern.finditer(text):
            candidates.append(
                (m.start(), -(m.end() - m.start()), order, etype, conf)
            )
            order += 1

    if not candidates:
        return []

    # Longest-span-wins overlap resolution: consider candidates by descending
    # length (then discovery order), keep those not overlapping a kept span.
    candidates.sort(key=lambda c: (c[1], c[2]))
    kept: list[tuple[int, int, str, float]] = []
    for start, neg_len, _, etype, conf in candidates:
        end = start - neg_len
        if all(end <= ks or start >= ke for ks, ke, _t, _c in kept):
            kept.append((start, end, etype, conf))

    kept.sort(key=lambda s: s[0])
    return kept
