"""Span redaction: boundary adjustment and offset-preserving splice.

Two redaction variants exist in the reference and both are reproduced:

* **typed mode** (``PIIRedactor.redact``, ``/root/reference/src/inference.py:356-403``):
  sort spans by start *descending*, then splice; masks are type-specific for
  NAME/EMAIL/PHONE/ID_NUMBER and the default token otherwise.  No boundary
  adjustment.

* **simple mode** (``SimplePIIRedactor.redact``,
  ``/root/reference/simple_inference.py:102-147``): adjust span boundaries to
  strip leading/trailing punctuation (digit-bearing spans keep ``-()``), then
  splice in *reverse order* with a single redaction token.

Both splice by character offset — Spark has no splice-by-offset builtin and
byte-equality with the reference requires identical splice order, so this
stays UDF payload (SURVEY.md §2.2 P8/P9).
"""

from __future__ import annotations

from .patterns import (
    DEFAULT_MASK,
    PUNCT_DIGIT_SPAN,
    PUNCT_TEXT_SPAN,
    TYPED_MASKS,
)

Span = tuple[int, int, str]  # (start, end, entity_type)


def adjust_boundaries(
    text: str, spans: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Trim leading/trailing punctuation from spans.

    Reference: simple_inference.py:149-180.  Spans containing any digit keep
    ``-()`` (phone formatting); all other spans trim the full punctuation set.
    Spans that become empty are dropped.
    """
    out: list[tuple[int, int]] = []
    for start, end in spans:
        has_digit = any(ch.isdigit() for ch in text[start:end])
        punct = PUNCT_DIGIT_SPAN if has_digit else PUNCT_TEXT_SPAN
        while start < end and text[start] in punct:
            start += 1
        while end > start and text[end - 1] in punct:
            end -= 1
        if start < end:
            out.append((start, end))
    return out


def redact_typed(
    text: str,
    spans: list[Span],
    replacement: str = DEFAULT_MASK,
    preserve_format: bool = True,
) -> str:
    """Typed-mask redaction.  Reference: inference.py:356-403.

    ``preserve_format=True`` (the reference default) uses type-specific
    masks for NAME/EMAIL/PHONE/ID_NUMBER and ``replacement`` otherwise;
    ``preserve_format=False`` masks *every* span with ``replacement``
    (inference.py:380-394's else branch).
    """
    result = text
    for start, end, etype in sorted(spans, key=lambda s: s[0], reverse=True):
        mask = (
            TYPED_MASKS.get(etype, replacement) if preserve_format
            else replacement
        )
        result = result[:start] + mask + result[end:]
    return result


def redact_simple(
    text: str, spans: list[Span], token: str = DEFAULT_MASK
) -> str:
    """Single-token redaction with boundary adjust.

    Reference: simple_inference.py:139-147 — adjust boundaries, then splice in
    reverse input order (spans arrive sorted ascending from detection, so
    ``reversed`` == descending start, no re-sort; mirrors the reference).
    """
    adjusted = adjust_boundaries(text, [(s, e) for s, e, _ in spans])
    result = text
    for start, end in reversed(adjusted):
        result = result[:start] + token + result[end:]
    return result
