"""Regression lock on the reference's curated multilingual corpus.

The reference ships 17 eyeballed examples (test_inference.py:28-134 —
EN/HE/ES/FR/DE/mixed, plus negative and adversarial cases) but asserts
nothing about them.  Here every output is byte-pinned: any change to the
detection/classification/redaction core that shifts one of these strings
must be a conscious decision.
"""

from __future__ import annotations

import pytest

from pii_redactor_spark.core.reference_impl import scrub_text

# (input, expected scrubbed, expects_pii)
CASES = [
    (
        "My name is John Doe and my SSN is 123-45-6789. You can reach me at "
        "john.doe@example.com or call (555) 123-4567.",
        "My name is [NAME_REDACTED] and my SSN is [ID_REDACTED]. You can "
        "reach me at [EMAIL_REDACTED] or call [REDACTED].",
        True,
    ),
    (
        "Customer information: Sarah Johnson, DOB: 03/15/1985, Credit Card: "
        "4532-1234-5678-9012, Address: 123 Oak Street, Springfield, IL 62701",
        "Customer information: [NAME_REDACTED], DOB: [REDACTED], Credit "
        "Card: [REDACTED], Address: [REDACTED], IL 62701",
        True,
    ),
    (
        "For urgent matters, contact Dr. Michael Smith at "
        "michael.smith@hospital.org or his mobile 555-987-6543.",
        "For urgent matters, contact Dr. [NAME_REDACTED] at "
        "[EMAIL_REDACTED] or his mobile [PHONE_REDACTED].",
        True,
    ),
    (
        "שמי אלון כהן ומספר תעודת הזהות שלי הוא 123456789. הטלפון שלי "
        "050-1234567 והמייל alon.cohen@example.co.il",
        "שמי [NAME_REDACTED] ומספר תעודת הזהות שלי הוא [ID_REDACTED]. "
        "הטלפון שלי [REDACTED] והמייל [EMAIL_REDACTED]",
        True,
    ),
    (
        "פרטי הלקוח: שרה לוי, נולדה ב-15 במרץ 1985, כתובת: רחוב הרצל 45, "
        "תל אביב. טלפון: 03-1234567",
        "פרטי הלקוח: [NAME_REDACTED], נולדה ב-[REDACTED], כתובת: רחוב "
        "[REDACTED]. טלפון: [REDACTED]",
        True,
    ),
    (
        'לפרטים נוספים צרו קשר עם ד"ר דוד מזרחי במייל '
        "david.mizrahi@clinic.co.il או בטלפון 052-9876543",
        'לפרטים נוספים צרו קשר עם ד"ר [NAME_REDACTED] במייל '
        "[EMAIL_REDACTED] או בטלפון [REDACTED]",
        True,
    ),
    (
        "מספר רישיון הרכב: 123-45-678, מספר דרכון: AB1234567, חשבון בנק: "
        "12-345-678901",
        "מספר רישיון הרכב: [REDACTED], מספר דרכון: [REDACTED], חשבון בנק: "
        "[REDACTED]",
        True,
    ),
    (
        "Mi nombre es María García y mi número de teléfono es 91-234-5678. "
        "Puedes contactarme en maria.garcia@correo.es",
        "Mi nombre es [REDACTED] y mi número de teléfono es [REDACTED]. "
        "Puedes contactarme en [EMAIL_REDACTED]",
        True,
    ),
    (
        "Datos del cliente: Pedro Martínez, nacido el 20/07/1990, dirección: "
        "Calle Mayor 123, Madrid, España",
        "Datos del cliente: Pedro Martínez, nacido el [REDACTED], dirección: "
        "[REDACTED], España",
        True,
    ),
    (
        "Je m'appelle Pierre Dubois et mon numéro de téléphone est "
        "01-23-45-67-89. Mon email est pierre.dubois@mail.fr",
        "Je m'appelle [NAME_REDACTED] et mon numéro de téléphone est "
        "[REDACTED]. Mon email est [EMAIL_REDACTED]",
        True,
    ),
    (
        "Informations client: Marie Lefebvre, née le 12/08/1988, adresse: "
        "15 Rue de la Paix, Paris, France",
        "Informations client: [NAME_REDACTED], née le [REDACTED], adresse: "
        "[REDACTED], France",
        True,
    ),
    (
        "Ich heiße Hans Mueller und meine Telefonnummer ist 030-12345678. "
        "Meine E-Mail ist hans.mueller@email.de",
        "Ich heiße [NAME_REDACTED] und meine Telefonnummer ist [REDACTED]. "
        "Meine E-Mail ist [EMAIL_REDACTED]",
        True,
    ),
    (
        "Kundendaten: Anna Schmidt, geboren am 05.04.1992, Adresse: "
        "Hauptstraße 67, Berlin, Deutschland",
        "Kundendaten: [NAME_REDACTED], geboren am [REDACTED], Adresse: "
        "Hauptstraße 67, Berlin, Deutschland",
        True,
    ),
    (
        "Contact info: John Smith (john@example.com) and שרה כהן "
        "(sarah@example.co.il), phone: 050-1234567",
        "Contact info: [NAME_REDACTED] ([EMAIL_REDACTED]) and "
        "[NAME_REDACTED] ([EMAIL_REDACTED]), phone: [REDACTED]",
        True,
    ),
    (
        "This text contains no PII information, just regular content about "
        "technology and science.",
        "This text contains no PII information, just regular content about "
        "technology and science.",
        False,
    ),
    (
        "Partial info: My name is J*** D** and my phone is 555-***-****",
        "Partial info: My name is J*** D** and my phone is 555-***-****",
        False,
    ),
    (
        "אין כאן מידע אישי, רק תוכן רגיל על טכנולוgia ומדע.",
        "אין כאן מידע אישי, רק תוכן רגיל על טכנולוgia ומדע.",
        False,
    ),
]


@pytest.mark.parametrize("text,expected,has_pii", CASES)
def test_reference_corpus_pinned(text, expected, has_pii):
    r = scrub_text(text)
    assert r.scrubbed == expected
    assert r.has_pii is has_pii


def test_every_email_and_every_negative():
    for text, expected, _ in CASES:
        if "@" in text:
            assert "[EMAIL_REDACTED]" in scrub_text(text).scrubbed
    # negatives pass through byte-identically
    for text, expected, has_pii in CASES:
        if not has_pii:
            assert scrub_text(text).scrubbed == text


# --- Notebook corpus (nootebook_test.ipynb cells 3-6) -----------------------
# The reference's hardest prose cases: a story paragraph, an English
# contact blurb, a Hebrew medical record, and names-in-prose.  Multi-line
# texts, pinned separately from the line-oriented CASES corpus.
NOTEBOOK_CASES = [
    (
        # cell 3 — story prose with curly quotes; the rules engine must
        # redact the protagonist and leave the business name alone
        "\nEvelyn Hartley had always dreamed of opening her own bakery, "
        "but she never imagined “Evy’s Breads & Bites”\n "
        "would become the neighborhood’s Saturday-morning ritual;\n",
        "\n[NAME_REDACTED] had always dreamed of opening her own bakery, "
        "but she never imagined “Evy’s Breads & Bites”\n "
        "would become the neighborhood’s Saturday-morning ritual;\n",
        True,
    ),
    (
        # cell 4 — contact blurb; URL must survive, phone/email/name go
        "\nMy name is John Doe and my email is john@example.com\n"
        "You can reach me at (123) 456-7890 or visit my website at "
        "https://www.johndoe.com.\n"
        "I love programming in Python and my favorite library is NumPy.\n",
        "\nMy name is [NAME_REDACTED] and my email is [EMAIL_REDACTED]\n"
        "You can reach me at [REDACTED] or visit my website at "
        "https://www.johndoe.com.\n"
        "I love programming in Python and my favorite library is NumPy.\n",
        True,
    ),
    (
        # cell 5 — Hebrew medical record: name, DOB, phone, address, ID all
        # redacted; the prose notes (including a bare first name) survive
        "\nשם חולה: יוסי כהן\n"
        "תאריך לידה: 01/01/1980\n"
        "מספר טלפון: 050-1234567\n"
        "כתובת: רחוב ירושלים 10, תל אביב\n"
        "תעודת זהות: 123456789\n"
        "הערות: יוסי סובל מאלרגיות למזון מסוים.  \n"
        "יש להימנע ממתן מזון המכיל אגוזים.\n",
        "\nשם חולה: [NAME_REDACTED]\n"
        "תאריך לידה: [REDACTED]\n"
        "מספר טלפון: [REDACTED]\n"
        "כתובת: רחוב [REDACTED]\n"
        "תעודת זהות: [ID_REDACTED]\n"
        "הערות: יוסי סובל מאלרגיות למזון מסוים.  \n"
        "יש להימנע ממתן מזון המכיל אגוזים.\n",
        True,
    ),
    (
        # cell 6 — names in casual prose: "Moshe cohen" (lowercase
        # surname), bare "David", "Tel aviv".  The gazetteer pair matcher
        # deliberately does not fire on these (precision choice of the
        # rules engine vs the reference's NER model); pinned as a
        # conscious no-op so any future gazetteer change here is explicit.
        "\nMoshe cohen went to buy some groceries.\n"
        "He bought apples, oranges, and bananas.\n"
        "His friend David joined him later.\n"
        "They discussed their plans for the weekend.\n"
        "Moshe's favorite fruit is mango, but he couldn't find any.\n"
        "David suggested trying the new fruit market in Tel aviv\n",
        None,  # expected == input (no redaction)
        False,
    ),
]


@pytest.mark.parametrize(
    "text,expected,has_pii",
    NOTEBOOK_CASES,
    ids=["story", "contact", "hebrew-medical", "names-prose"],
)
def test_notebook_corpus_pinned(text, expected, has_pii):
    r = scrub_text(text)
    assert r.scrubbed == (expected if expected is not None else text)
    assert r.has_pii == has_pii


def test_notebook_entities():
    """Entity-level pins for the two redacting notebook cases."""
    story = scrub_text(NOTEBOOK_CASES[0][0])
    assert [(e["entity_type"], e["text"]) for e in story.entities] == [
        ("NAME", "Evelyn Hartley")
    ]
    med = scrub_text(NOTEBOOK_CASES[2][0])
    assert [(e["entity_type"], e["text"]) for e in med.entities] == [
        ("NAME", "יוסי כהן"),
        ("DATE_OF_BIRTH", "01/01/1980"),
        ("UNKNOWN", "050-1234567"),
        ("UNKNOWN", "ירושלים 10, תל אביב"),
        ("ID_NUMBER", "123456789"),
    ]


def test_classify_bank_byte_equals_reference_source():
    """Round-3 verdict #4: CLASSIFY_PATTERNS must byte-equal the regex
    strings in the reference source itself
    (/root/reference/src/inference.py:161-186) — so the pin bottoms out
    in the reference, not in this repo's own history.  The dict literal
    is extracted by AST, not by line numbers, so harmless reformatting
    of the reference would not break the test."""
    import ast

    from pii_redactor_spark.core.patterns import CLASSIFY_PATTERNS

    src_path = "/root/reference/src/inference.py"
    try:
        with open(src_path) as f:
            tree = ast.parse(f.read())
    except OSError:
        import pytest

        pytest.skip("reference source not available in this environment")
    banks = None
    for node in ast.walk(tree):
        if not isinstance(node, ast.Return) or not isinstance(
            node.value, ast.Dict
        ):
            continue
        try:
            cand = ast.literal_eval(node.value)
        except ValueError:
            continue
        if isinstance(cand, dict) and set(cand) == set(CLASSIFY_PATTERNS):
            banks = cand
            break
    assert banks is not None, "classification dict not found in reference"
    # byte-for-byte: same types, same order, same pattern strings
    assert list(banks) == list(CLASSIFY_PATTERNS)
    assert banks == CLASSIFY_PATTERNS


def test_shared_tables_match_pins():
    """The engine/oracle shared data tables (pattern banks, gazetteers,
    stopwords, generator lists, templates) must match their checked-in
    SHA-256 pins — a drifted constant would silently move BOTH sides of
    the correctness gate (round-3 verdict #4)."""
    from pii_redactor_spark.fixtures.table_pins import (
        assert_shared_tables_pinned,
        shared_table_digests,
    )

    assert_shared_tables_pinned()
    # and the digest really is content-sensitive, not a constant
    digests = shared_table_digests()
    assert len(set(digests.values())) == len(digests)
