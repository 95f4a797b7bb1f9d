"""Gazetteers for name/address detection and fixture value generation.

The Hebrew lists reproduce the reference's synthetic-data vocabulary
(``/root/reference/src/dataset_creation.py:52-87``) — they are *data* (common
Israeli names/places), required both to generate parity fixtures and to detect
those values with a gazetteer matcher.  The Latin-language lists are our own
(the reference uses the Faker library there, which is not available in this
environment; our generators are seeded and self-contained).
"""

from __future__ import annotations

import re

# --- Hebrew vocabulary (dataset_creation.py:52-87) -------------------------
HE_FIRST_NAMES = [
    "אלון", "שרה", "דוד", "רחל", "משה", "לאה", "יוסף", "מרים",
    "אברהם", "רבקה", "יצחק", "אסתר", "יעקב", "חנה", "נח", "דינה",
    "בנימין", "תמר", "שמואל", "נעמי", "אליהו", "רות", "דניאל", "עדינה",
    "גבריאל", "שושנה", "מיכאל", "יעל", "אורי", "טליה", "עומר", "נויה",
]
HE_SURNAMES = [
    "כהן", "לוי", "מזרחי", "פרץ", "ביטון", "אזולאי", "דהן", "אברהם",
    "חדד", "גבאי", "אוחיון", "בן דוד", "מלכה", "אשכנזי", "ישראלי", "ברוך",
    "סעדון", "חיים", "נחום", "שלום", "בן שמעון", "זכריה", "אליאס", "יוסף",
]
HE_CITIES = [
    "תל אביב", "ירושלים", "חיפה", "ראשון לציון", "פתח תקווה", "אשדוד",
    "נתניה", "באר שבע", "בני ברק", "חולון", "רמת גן", "אשקלון",
    "רחובות", "בת ים", "כפר סבא", "הרצליה", "מודיעין", "רעננה",
]
HE_STREETS = [
    "הרצל", "ויצמן", "רוטשילד", "בן גוריון", "ז'בוטינסקי", "אלנבי",
    "דיזנגוף", "בן יהודה", "המלך ג'ורג'", "שדרות ירושלים", "הארבעה",
    "סוקולוב", "ביאליק", "אחד העם", "הנביאים", "יפו",
]
EMAIL_DOMAINS = [
    "gmail.com", "walla.co.il", "hotmail.com", "yahoo.com",
    "outlook.com", "mail.huji.ac.il", "technion.ac.il", "tau.ac.il",
]
IL_PHONE_PREFIXES = ["050", "052", "053", "054", "055", "058"]

# Transliteration used for email-from-name (dataset_creation.py:124-127).
HE_TRANSLITERATION = {
    "אלון": "alon", "שרה": "sarah", "דוד": "david", "רחל": "rachel",
    "משה": "moshe", "לאה": "leah", "יוסף": "yosef", "מרים": "miriam",
}

# --- Latin-language vocabulary (ours; stands in for Faker) ------------------
LATIN_NAMES = {
    "en": {
        "first": ["John", "Sarah", "Michael", "Emily", "David", "Jessica",
                  "Robert", "Ashley", "James", "Amanda", "William", "Olivia"],
        "last": ["Smith", "Johnson", "Brown", "Taylor", "Wilson", "Davis",
                 "Clark", "Walker", "Hall", "Young", "Allen", "King", "Doe"],
        "streets": ["Oak Street", "Maple Avenue", "Main Street", "Park Road",
                    "Cedar Lane", "Elm Drive", "Lake View", "Hill Road"],
        "cities": ["Springfield", "Riverside", "Fairview", "Georgetown",
                   "Clinton", "Salem", "Madison", "Arlington"],
    },
    "es": {
        "first": ["María", "José", "Carmen", "Antonio", "Isabel", "Manuel",
                  "Lucía", "Francisco", "Ana", "Javier", "Elena", "Carlos"],
        "last": ["García", "Rodríguez", "Martínez", "Fernández", "López",
                 "Sánchez", "Pérez", "Gómez", "Díaz", "Torres"],
        "streets": ["Calle Mayor", "Avenida Real", "Calle Sol", "Paseo Verde",
                    "Calle Luna", "Avenida Norte"],
        "cities": ["Madrid", "Barcelona", "Valencia", "Sevilla", "Zaragoza",
                   "Granada"],
    },
    "fr": {
        "first": ["Pierre", "Marie", "Jean", "Sophie", "Luc", "Camille",
                  "Nicolas", "Julie", "Paul", "Claire", "Hugo", "Emma"],
        "last": ["Dubois", "Lefebvre", "Moreau", "Laurent", "Simon", "Michel",
                 "Garcia", "Bernard", "Durand", "Petit"],
        "streets": ["Rue de la Paix", "Avenue Victor", "Rue du Port",
                    "Boulevard Sud", "Rue des Fleurs", "Avenue Centrale"],
        "cities": ["Paris", "Lyon", "Marseille", "Toulouse", "Nantes", "Lille"],
    },
    "de": {
        "first": ["Hans", "Anna", "Peter", "Julia", "Thomas", "Laura",
                  "Michael", "Sofia", "Stefan", "Lena", "Felix", "Clara"],
        "last": ["Mueller", "Schmidt", "Schneider", "Fischer", "Weber",
                 "Meyer", "Wagner", "Becker", "Hoffmann", "Koch"],
        "streets": ["Hauptstrasse", "Bahnhofstrasse", "Gartenweg",
                    "Schulstrasse", "Bergweg", "Lindenallee"],
        "cities": ["Berlin", "Hamburg", "Muenchen", "Koeln", "Frankfurt",
                   "Stuttgart"],
    },
}

LATIN_EMAIL_DOMAINS = ["example.com", "mail.net", "post.org", "web.io"]


def _alt(words: list[str]) -> str:
    """Regex alternation of literal words, longest first (greedy safety)."""
    return "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True))


# --- Detection-only vocabulary extensions -----------------------------------
# The reference's notebook corpus (nootebook_test.ipynb cells 3-6) uses names
# and streets outside the dataset_creation.py vocabulary.  These extras feed
# the DETECTION patterns only — they are deliberately NOT appended to the
# generator lists above, so seeded fixture values and the trigram-LM training
# corpus are byte-stable across this addition.
HE_FIRST_NAMES_DETECT_EXTRA = ["יוסי"]          # nootebook_test.ipynb cell 5
HE_STREETS_DETECT_EXTRA = ["ירושלים"]           # "רחוב ירושלים 10, תל אביב"
LATIN_FIRST_DETECT_EXTRA = ["Evelyn", "Moshe"]  # cells 3 and 6
LATIN_LAST_DETECT_EXTRA = ["Hartley", "Cohen"]


# --- Compiled gazetteer detection patterns ----------------------------------
# Hebrew full name: "<first> <surname>" where surname may be two words.
HE_NAME_PATTERN = re.compile(
    r"(?:%s) (?:%s)" % (
        _alt(HE_FIRST_NAMES + HE_FIRST_NAMES_DETECT_EXTRA),
        _alt(HE_SURNAMES),
    )
)
# Hebrew address: "<street> <1-150>, <city>" (dataset_creation.py:114-119).
HE_ADDRESS_PATTERN = re.compile(
    r"(?:%s) \d{1,3}, (?:%s)" % (
        _alt(HE_STREETS + HE_STREETS_DETECT_EXTRA), _alt(HE_CITIES)
    )
)

_ALL_LATIN_FIRST = [n for lang in LATIN_NAMES.values() for n in lang["first"]]
_ALL_LATIN_LAST = [n for lang in LATIN_NAMES.values() for n in lang["last"]]
_ALL_LATIN_STREETS = [s for lang in LATIN_NAMES.values() for s in lang["streets"]]
_ALL_LATIN_CITIES = [c for lang in LATIN_NAMES.values() for c in lang["cities"]]

LATIN_NAME_PATTERN = re.compile(
    r"\b(?:%s) (?:%s)\b" % (
        _alt(_ALL_LATIN_FIRST + LATIN_FIRST_DETECT_EXTRA),
        _alt(_ALL_LATIN_LAST + LATIN_LAST_DETECT_EXTRA),
    )
)
# Latin address: "<number> <street>, <city>" (en) or "<street> <number>, <city>".
LATIN_ADDRESS_PATTERN = re.compile(
    r"\b(?:\d{1,4} (?:%s)|(?:%s) \d{1,4}), (?:%s)\b"
    % (_alt(_ALL_LATIN_STREETS), _alt(_ALL_LATIN_STREETS), _alt(_ALL_LATIN_CITIES))
)

# Detection order for gazetteer banks: addresses before names so that a name
# embedded in an address string does not shadow the longer address span.
GAZETTEER_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("ADDRESS", HE_ADDRESS_PATTERN),
    ("ADDRESS", LATIN_ADDRESS_PATTERN),
    ("NAME", HE_NAME_PATTERN),
    ("NAME", LATIN_NAME_PATTERN),
]
