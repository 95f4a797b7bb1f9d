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

_STOPWORD_RE = {
    lang: re.compile(
        r"(?<![\w])(?:%s)(?![\w])" % "|".join(words), re.IGNORECASE
    )
    for lang, words in _STOPWORDS.items()
}
_MARKER_RE = {
    lang: re.compile("[%s%s]" % (chars, chars.upper()))
    for lang, chars in _MARKERS.items()
    if chars
}


def classify_batch(texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """Return (langs: array[str], confidence: array[float]) for a batch."""
    n = len(texts)
    scores = np.zeros((n, len(LANGS)), dtype=np.float64)
    for i, text in enumerate(texts):
        t = text or ""
        scores[i, 0] = 3.0 * len(_HEBREW_CHARS.findall(t))
        for j, lang in enumerate(LANGS[1:], start=1):
            s = 2.0 * len(_STOPWORD_RE[lang].findall(t))
            marker = _MARKER_RE.get(lang)
            if marker:
                s += 1.5 * len(marker.findall(t))
            scores[i, j] = s
    total = scores.sum(axis=1)
    best = scores.argmax(axis=1)
    conf = np.where(total > 0, scores[np.arange(n), best] / (total + 1e-9), 0.0)
    langs = np.where(total > 0, np.array(LANGS, dtype=object)[best], "und")
    return langs.astype(object), conf
