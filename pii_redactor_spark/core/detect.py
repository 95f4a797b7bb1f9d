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

from .gazetteers import GAZETTEER_PATTERNS
from .patterns import COMPILED_DETECT


def detect_spans(text: str) -> list[tuple[int, int, str]]:
    """Find all PII spans in ``text``.

    Returns a list of ``(start, end, entity_type)`` with no overlaps,
    sorted by start offset.
    """
    if not text:
        return []

    candidates: list[tuple[int, int, int, str]] = []  # (start, -len, order, type)
    order = 0
    for etype, pattern in GAZETTEER_PATTERNS:
        for m in pattern.finditer(text):
            candidates.append((m.start(), -(m.end() - m.start()), order, etype))
            order += 1
    for etype, pattern in COMPILED_DETECT:
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
