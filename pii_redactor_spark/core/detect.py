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

# Guard classification of the structured bank: every COMPILED_DETECT pattern
# except EMAIL contains a mandatory \d, so a digit-free text cannot match it;
# EMAIL requires a literal '@'.  Guards are exact prefilters (they can only
# skip scans that provably cannot match), so results are byte-identical —
# they just make the common clean-caption case ~4x cheaper.
_DETECT_DIGIT = [(t, p) for t, p in COMPILED_DETECT if t != "EMAIL"]
_DETECT_EMAIL = [(t, p) for t, p in COMPILED_DETECT if t == "EMAIL"]
assert all("\\d" in p.pattern or re.search(r"\d", p.pattern)
           for _, p in _DETECT_DIGIT)


def detect_spans(text: str) -> list[tuple[int, int, str]]:
    """Find all PII spans in ``text``.

    Returns a list of ``(start, end, entity_type)`` with no overlaps,
    sorted by start offset.
    """
    if not text:
        return []

    banks = list(GAZETTEER_PATTERNS)
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
