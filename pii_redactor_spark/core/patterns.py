"""Regex banks and mask vocabulary.

Two distinct pattern banks live here:

1. ``CLASSIFY_PATTERNS`` — the *classification* bank: given an already-detected
   entity span, decide its type.  Semantics reproduce the reference exactly
   (``/root/reference/src/inference.py:154-213``): ordered dict of
   type -> list-of-patterns, first match wins (``re.search`` with
   ``re.IGNORECASE``), then a Hebrew-name fallback, then an English-name
   (<= 3 words) fallback, else ``UNKNOWN``.

2. ``DETECT_PATTERNS`` — the *detection* bank: our from-scratch replacement for
   the reference's token-classification model.  Structured PII (emails, phones,
   IDs, cards, dates, plates, bank accounts, passports, addresses) is found by
   compiled regex; names are found by gazetteer alternations
   (``core.gazetteers``).  This bank is an engine choice, not reference parity
   — the reference's model is replaced by rules per the project brief
   ("compiled-regex PII redaction ... names via gazetteer trie").

Mask vocabulary reproduces ``/root/reference/src/inference.py:382-394``:
typed masks exist only for NAME / EMAIL / PHONE / ID_NUMBER; every other type
falls back to the default replacement token.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Classification bank — exact reference parity (src/inference.py:161-186).
# Order matters: dict insertion order is the evaluation order.
# ---------------------------------------------------------------------------
CLASSIFY_PATTERNS: dict[str, list[str]] = {
    "EMAIL": [
        r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b",
    ],
    "PHONE": [
        r"\b\d{3}-\d{3}-\d{4}\b",
        r"\b\d{3}-\d{4}-\d{3}\b",
        r"\b\+\d{1,3}[-.\s]?\d{1,14}\b",
    ],
    "ID_NUMBER": [
        r"\b\d{9}\b",
        r"\b\d{3}-\d{2}-\d{4}\b",
    ],
    "CREDIT_CARD": [
        r"\b\d{4}[-\s]?\d{4}[-\s]?\d{4}[-\s]?\d{4}\b",
        r"\b\*{4}[-\s]?\*{4}[-\s]?\*{4}[-\s]?\d{4}\b",
    ],
    "LICENSE_PLATE": [
        r"\b\d{2,3}-\d{3}-\d{2,3}\b",
        r"\b[A-Z]{2}\d{3}[A-Z]{2}\b",
    ],
    "DATE_OF_BIRTH": [
        r"\b\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4}\b",
        r"\b\d{1,2}\s+(ב)?[א-ת]+\s+\d{4}\b",
    ],
}

# Name fallbacks (src/inference.py:204-211).
HEBREW_NAME_RE = re.compile(r"^[א-ת]+(\s+[א-ת]+)*$")
ENGLISH_NAME_RE = re.compile(r"^[A-Za-z]+(\s+[A-Za-z]+)*$")

COMPILED_CLASSIFY: list[tuple[str, list[re.Pattern]]] = [
    (ptype, [re.compile(p, re.IGNORECASE) for p in pats])
    for ptype, pats in CLASSIFY_PATTERNS.items()
]

# ---------------------------------------------------------------------------
# Mask vocabulary (src/inference.py:382-394).
# ---------------------------------------------------------------------------
DEFAULT_MASK = "[REDACTED]"
TYPED_MASKS: dict[str, str] = {
    "NAME": "[NAME_REDACTED]",
    "EMAIL": "[EMAIL_REDACTED]",
    "PHONE": "[PHONE_REDACTED]",
    "ID_NUMBER": "[ID_REDACTED]",
}

# ---------------------------------------------------------------------------
# Boundary-adjust punctuation sets (simple_inference.py:162-173).
# Digit-bearing spans keep '-', '(' and ')' (phone-format preservation);
# everything else trims the full set.
# ---------------------------------------------------------------------------
PUNCT_DIGIT_SPAN = "—[]{}\"':;.,!?/\\|@#$%^&*+=~`"
PUNCT_TEXT_SPAN = "—-()[]{}\"':;.,!?/\\|@#$%^&*+=~`"

# ---------------------------------------------------------------------------
# Detection bank — structured PII (our rules engine; formats follow the
# reference's synthetic generators, src/dataset_creation.py:89-173, plus the
# common international shapes from its test corpus, test_inference.py:28-134).
# Each entry: (entity_type, pattern).  Overlap resolution: longest span wins,
# ties broken by bank order.
# ---------------------------------------------------------------------------
DETECT_STRUCTURED: list[tuple[str, str]] = [
    ("EMAIL", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"),
    # Israeli mobile 05X-XXX-XXXX (dataset_creation.py:108-112) and generic 3-3-4.
    ("PHONE", r"\b\d{3}-\d{3}-\d{4}\b"),
    # US-style with parenthesised area code: (555) 123-4567.
    ("PHONE", r"\(\d{3}\)\s?\d{3}-\d{4}"),
    # International +XX...
    ("PHONE", r"\+\d{1,3}[-.\s]?\d{6,14}\b"),
    # Israeli mobile/landline without the second hyphen: 050-1234567,
    # 03-1234567 (reference test corpus, test_inference.py:56,69).
    ("PHONE", r"\b0\d{1,2}-\d{7,8}\b"),
    # European 2-3-4 shape: 91-234-5678 (test_inference.py:82).
    ("PHONE", r"\b\d{2}-\d{3}-\d{4}\b"),
    # French pair-wise: 01-23-45-67-89 (test_inference.py:91).
    ("PHONE", r"\b\d{2}(?:-\d{2}){4}\b"),
    # SSN 123-45-6789 (test_inference.py:39).
    ("ID_NUMBER", r"\b\d{3}-\d{2}-\d{4}\b"),
    # Israeli ID: bare 9 digits (dataset_creation.py:89-106).
    ("ID_NUMBER", r"\b\d{9}\b"),
    # Credit card 4-4-4-4 (digits or masked ****-****-****-1234,
    # dataset_creation.py:135-139).
    ("CREDIT_CARD", r"\b\d{4}[-\s]\d{4}[-\s]\d{4}[-\s]\d{4}\b"),
    ("CREDIT_CARD", r"\*{4}[-\s]?\*{4}[-\s]?\*{4}[-\s]?\d{4}\b"),
    # Passport AA####### (dataset_creation.py:141-145).
    ("PASSPORT", r"\b[A-Z]{2}\d{7}\b"),
    # IBAN-like bank account CC##(+12 digits) — our multilingual generator shape.
    ("BANK_ACCOUNT", r"\b[A-Z]{2}\d{14}\b"),
    # Israeli bank account bb-bbb-dddddd (dataset_creation.py:147-152).
    ("BANK_ACCOUNT", r"\b\d{2}-\d{3}-\d{6}\b"),
    # Israeli license plates XXX-XX-XXX / XX-XXX-XX (dataset_creation.py:167-173).
    ("LICENSE_PLATE", r"\b\d{3}-\d{2}-\d{3}\b"),
    ("LICENSE_PLATE", r"\b\d{2}-\d{3}-\d{2}\b(?!-)"),
    # European plate AB123CD.
    ("LICENSE_PLATE", r"\b[A-Z]{2}\d{3}[A-Z]{2}\b"),
    # Dates dd/mm/yyyy, dd.mm.yyyy, dd-mm-yyyy (dataset_creation.py:588).
    ("DATE_OF_BIRTH", r"\b\d{1,2}[/.\-]\d{1,2}[/.\-]\d{2,4}\b"),
]

# Hebrew date "12 במרץ 1985" (dataset_creation.py:154-165) — month alternation
# keeps this from firing on arbitrary Hebrew prose.
HEBREW_MONTHS = [
    "ינואר", "פברואר", "מרץ", "אפריל", "מאי", "יוני",
    "יולי", "אוגוסט", "ספטמבר", "אוקטובר", "נובמבר", "דצמבר",
]
DETECT_STRUCTURED.append(
    ("DATE_OF_BIRTH", r"\b\d{1,2} ב(?:%s) \d{4}\b" % "|".join(HEBREW_MONTHS))
)

COMPILED_DETECT: list[tuple[str, re.Pattern]] = [
    (ptype, re.compile(pat)) for ptype, pat in DETECT_STRUCTURED
]
