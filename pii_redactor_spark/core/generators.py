"""Seeded PII value generators — deterministic, per-row-keyed.

Formats mirror the reference's synthetic generators
(``/root/reference/src/dataset_creation.py:89-173`` for Hebrew/Israeli values;
``:565-598`` uses Faker for en/es/fr/de — Faker is unavailable here, so the
Latin-language values come from our own gazetteer lists with comparable shapes).

Unlike the reference (module-global ``random`` seeded once, order-dependent),
every generator takes a ``numpy.random.Generator`` so randomness is keyed to
the row (``image_id``) and identical at any partitioning/parallelism
(SURVEY.md §2.8 F9).
"""

from __future__ import annotations

import numpy as np

from . import gazetteers as gz
from .patterns import HEBREW_MONTHS


def _digits(rng: np.random.Generator, n: int) -> str:
    return "".join(str(d) for d in rng.integers(0, 10, size=n))


def israeli_id(rng: np.random.Generator) -> str:
    """9-digit Israeli ID with Luhn check digit (dataset_creation.py:89-106)."""
    ds = [int(d) for d in rng.integers(0, 10, size=8)]
    total = 0
    for i, d in enumerate(ds):
        if i % 2 == 0:
            doubled = d * 2
            total += doubled if doubled < 10 else doubled - 9
        else:
            total += d
    ds.append((10 - (total % 10)) % 10)
    return "".join(map(str, ds))


def israeli_phone(rng: np.random.Generator) -> str:
    prefix = gz.IL_PHONE_PREFIXES[rng.integers(0, len(gz.IL_PHONE_PREFIXES))]
    suffix = _digits(rng, 7)
    return f"{prefix}-{suffix[:3]}-{suffix[3:]}"


def hebrew_name(rng: np.random.Generator) -> str:
    first = gz.HE_FIRST_NAMES[rng.integers(0, len(gz.HE_FIRST_NAMES))]
    last = gz.HE_SURNAMES[rng.integers(0, len(gz.HE_SURNAMES))]
    return f"{first} {last}"


def hebrew_address(rng: np.random.Generator) -> str:
    street = gz.HE_STREETS[rng.integers(0, len(gz.HE_STREETS))]
    number = int(rng.integers(1, 151))
    city = gz.HE_CITIES[rng.integers(0, len(gz.HE_CITIES))]
    return f"{street} {number}, {city}"


def email_from_name(rng: np.random.Generator, name: str) -> str:
    """Email from transliterated first name (dataset_creation.py:121-133)."""
    eng = gz.HE_TRANSLITERATION.get(
        name.split()[0], f"user{int(rng.integers(100, 1000))}"
    )
    domain = gz.EMAIL_DOMAINS[rng.integers(0, len(gz.EMAIL_DOMAINS))]
    return f"{eng}{int(rng.integers(1, 100))}@{domain}"


def credit_card_masked(rng: np.random.Generator) -> str:
    return f"****-****-****-{_digits(rng, 4)}"


def passport(rng: np.random.Generator) -> str:
    letters = "".join(
        chr(ord("A") + int(c)) for c in rng.integers(0, 26, size=2)
    )
    return f"{letters}{_digits(rng, 7)}"


def israeli_bank_account(rng: np.random.Generator) -> str:
    return (
        f"{int(rng.integers(10, 21))}-{int(rng.integers(100, 1000))}-"
        f"{int(rng.integers(100000, 1000000))}"
    )


def hebrew_dob(rng: np.random.Generator) -> str:
    day = int(rng.integers(1, 29))
    month = int(rng.integers(1, 13))
    year = int(rng.integers(1950, 2006))
    return f"{day} ב{HEBREW_MONTHS[month - 1]} {year}"


def israeli_license_plate(rng: np.random.Generator) -> str:
    if rng.integers(0, 2) == 0:
        return (
            f"{int(rng.integers(100, 1000))}-{int(rng.integers(10, 100))}-"
            f"{int(rng.integers(100, 1000))}"
        )
    return (
        f"{int(rng.integers(10, 100))}-{int(rng.integers(100, 1000))}-"
        f"{int(rng.integers(10, 100))}"
    )


# --- Latin-language values (our seeded stand-ins for Faker, :565-598) -------

def latin_name(rng: np.random.Generator, lang: str) -> str:
    names = gz.LATIN_NAMES[lang]
    first = names["first"][rng.integers(0, len(names["first"]))]
    last = names["last"][rng.integers(0, len(names["last"]))]
    return f"{first} {last}"


def latin_id_number(rng: np.random.Generator, lang: str) -> str:
    if lang == "en":  # SSN shape, like faker.ssn()
        return f"{_digits(rng, 3)}-{_digits(rng, 2)}-{_digits(rng, 4)}"
    return _digits(rng, 9)


def latin_phone(rng: np.random.Generator, lang: str) -> str:
    return f"{_digits(rng, 3)}-{_digits(rng, 3)}-{_digits(rng, 4)}"


def latin_email(rng: np.random.Generator, name: str) -> str:
    user = name.lower().replace(" ", ".")
    # Strip accents so the address stays ASCII like real-world emails.
    user = "".join(_ASCII_FOLD.get(ch, ch) for ch in user)
    domain = gz.LATIN_EMAIL_DOMAINS[rng.integers(0, len(gz.LATIN_EMAIL_DOMAINS))]
    return f"{user}@{domain}"


_ASCII_FOLD = {
    "á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u", "ñ": "n", "ü": "u",
    "è": "e", "ê": "e", "à": "a", "ç": "c", "ö": "o", "ä": "a", "ß": "ss",
}


def latin_address(rng: np.random.Generator, lang: str) -> str:
    names = gz.LATIN_NAMES[lang]
    street = names["streets"][rng.integers(0, len(names["streets"]))]
    city = names["cities"][rng.integers(0, len(names["cities"]))]
    number = int(rng.integers(1, 200))
    if lang == "en":
        return f"{number} {street}, {city}"
    return f"{street} {number}, {city}"


def latin_credit_card(rng: np.random.Generator) -> str:
    return f"{_digits(rng, 4)}-{_digits(rng, 4)}-{_digits(rng, 4)}-{_digits(rng, 4)}"


def latin_dob(rng: np.random.Generator) -> str:
    return (
        f"{int(rng.integers(1, 29)):02d}/{int(rng.integers(1, 13)):02d}/"
        f"{int(rng.integers(1950, 2006))}"
    )


def latin_bank_account(rng: np.random.Generator, lang: str) -> str:
    country = {"en": "GB", "es": "ES", "fr": "FR", "de": "DE"}[lang]
    return f"{country}{_digits(rng, 14)}"


def latin_license_plate(rng: np.random.Generator) -> str:
    letters = [chr(ord("A") + int(c)) for c in rng.integers(0, 26, size=4)]
    return f"{letters[0]}{letters[1]}{_digits(rng, 3)}{letters[2]}{letters[3]}"


def generate_value(
    rng: np.random.Generator, entity_type: str, lang: str, context: dict
) -> str:
    """Dispatch like the reference's generate_value (:306-335, :565-598).

    ``context`` carries previously generated values so EMAIL can derive from
    NAME, mirroring dataset_creation.py:321.
    """
    if lang == "he":
        table = {
            "NAME": lambda: hebrew_name(rng),
            "ID_NUMBER": lambda: israeli_id(rng),
            "PHONE": lambda: israeli_phone(rng),
            "EMAIL": lambda: email_from_name(rng, context.get("NAME", "user")),
            "ADDRESS": lambda: hebrew_address(rng),
            "CREDIT_CARD": lambda: credit_card_masked(rng),
            "DATE_OF_BIRTH": lambda: hebrew_dob(rng),
            "PASSPORT": lambda: passport(rng),
            "BANK_ACCOUNT": lambda: israeli_bank_account(rng),
            "LICENSE_PLATE": lambda: israeli_license_plate(rng),
        }
    else:
        table = {
            "NAME": lambda: latin_name(rng, lang),
            "ID_NUMBER": lambda: latin_id_number(rng, lang),
            "PHONE": lambda: latin_phone(rng, lang),
            "EMAIL": lambda: latin_email(
                rng, context.get("NAME", latin_name(rng, lang))
            ),
            "ADDRESS": lambda: latin_address(rng, lang),
            "CREDIT_CARD": lambda: latin_credit_card(rng),
            "DATE_OF_BIRTH": lambda: latin_dob(rng),
            "PASSPORT": lambda: passport(rng),
            "BANK_ACCOUNT": lambda: latin_bank_account(rng, lang),
            "LICENSE_PLATE": lambda: latin_license_plate(rng),
        }
    gen = table.get(entity_type)
    return gen() if gen else "[UNKNOWN]"
