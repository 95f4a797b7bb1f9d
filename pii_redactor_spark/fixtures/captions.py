"""Caption generation with ground-truth entity spans.

Mirrors the reference's sample assembly (``generate_sample``,
``/root/reference/src/dataset_creation.py:614-701``): pick a weighted template,
generate a value per entity type (EMAIL may derive from NAME via context),
fill placeholders left-to-right with ``find``+``replace(.., 1)``, and record
the character span of each inserted value.  Placeholder appearance order
equals the entity-list order in every template, so spans recorded at
replacement time are final (later replacements are strictly to the right).

On top of the reference grammar we inject the corpus shapes the quality
filter must catch (junk: symbol spam / repetition / gibberish / too-short)
and a long-caption tail for skew testing (FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from ..core import generators as gen
from ..core.templates import HEBREW_RATIO, LANGUAGES, templates_for

_GIBBERISH_ALPHABET = list("zxqjvkwbgf aeiouy")
_SYMBOLS = list("@#$%^&*()!~{}|\\<>")


@dataclass(frozen=True)
class CaptionConfig:
    junk_ratio: float = 0.12
    long_tail_ratio: float = 0.03
    hebrew_ratio: float = HEBREW_RATIO
    # Optional heavy-hitter language for skew experiments: e.g. ("he", 0.7).
    heavy_language: tuple[str, float] | None = None
    entity_types: tuple[str, ...] = field(default=())


def rng_for(image_id: str) -> np.random.Generator:
    """Per-row RNG keyed by image_id — stable across processes/partitions."""
    digest = hashlib.blake2b(image_id.encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(digest, "little"))


def _pick_language(rng: np.random.Generator, cfg: CaptionConfig) -> str:
    if cfg.heavy_language is not None:
        lang, ratio = cfg.heavy_language
        if rng.random() < ratio:
            return lang
        rest = [l for l in LANGUAGES if l != lang]
        return rest[rng.integers(0, len(rest))]
    if rng.random() < cfg.hebrew_ratio:
        return "he"
    rest = [l for l in LANGUAGES if l != "he"]
    return rest[rng.integers(0, len(rest))]


def _template_caption(
    rng: np.random.Generator, lang: str
) -> tuple[str, list[dict]]:
    templates = templates_for(lang)
    template, etypes = templates[rng.integers(0, len(templates))]
    context: dict[str, str] = {}
    values: list[tuple[str, str]] = []
    for etype in etypes:
        value = gen.generate_value(rng, etype, lang, context)
        context[etype] = value
        values.append((etype, value))

    text = template
    entities: list[dict] = []
    for etype, value in values:
        placeholder = "{%s}" % etype
        start = text.find(placeholder)
        if start == -1:
            continue
        text = text.replace(placeholder, value, 1)
        entities.append(
            {"entity_type": etype, "text": value, "start": start,
             "end": start + len(value)}
        )
    return text, entities


def _junk_caption(rng: np.random.Generator) -> str:
    kind = int(rng.integers(0, 4))
    if kind == 0:  # symbol spam
        n = int(rng.integers(20, 60))
        return "".join(
            _SYMBOLS[i] for i in rng.integers(0, len(_SYMBOLS), size=n)
        )
    if kind == 1:  # repeated token
        word = "".join(
            _GIBBERISH_ALPHABET[i]
            for i in rng.integers(0, len(_GIBBERISH_ALPHABET) - 2, size=4)
        ).strip() or "spam"
        return " ".join([word] * int(rng.integers(8, 20)))
    if kind == 2:  # gibberish words
        n = int(rng.integers(30, 80))
        return "".join(
            _GIBBERISH_ALPHABET[i]
            for i in rng.integers(0, len(_GIBBERISH_ALPHABET), size=n)
        )
    return "ok"  # too short


def _long_caption(rng: np.random.Generator, lang: str) -> str:
    clean = [t for t, e in templates_for(lang) if not e]
    k = int(rng.integers(6, 12))
    picks = [clean[i] for i in rng.integers(0, len(clean), size=k)]
    # Deduplicate adjacent repeats to keep distinct-token ratio healthy;
    # the point of the tail is *length* skew, not drop-rate.
    return " ".join(dict.fromkeys(picks)) + " " + " ".join(
        f"tag{int(i)}" for i in rng.integers(0, 10_000, size=8)
    )


def make_caption(image_id: str, cfg: CaptionConfig = CaptionConfig()) -> dict:
    """Generate one caption with metadata + true spans, keyed by image_id.

    Returns dict with: caption, lang (template language or 'junk'),
    entities (true spans), kind ('template'|'junk'|'long').
    """
    rng = rng_for(image_id)
    roll = rng.random()
    lang = _pick_language(rng, cfg)
    if roll < cfg.junk_ratio:
        return {
            "caption": _junk_caption(rng), "lang": lang,
            "entities": [], "kind": "junk",
        }
    if roll < cfg.junk_ratio + cfg.long_tail_ratio:
        return {
            "caption": _long_caption(rng, lang), "lang": lang,
            "entities": [], "kind": "long",
        }
    caption, entities = _template_caption(rng, lang)
    return {"caption": caption, "lang": lang, "entities": entities,
            "kind": "template"}
