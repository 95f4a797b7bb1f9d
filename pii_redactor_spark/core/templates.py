"""Caption template grammar — parity with the reference's synthetic corpus.

Reproduces the sentence templates of ``/root/reference/src/dataset_creation.py``:
Hebrew PII/clean/mixed templates (:183-300), English (:380-469), Spanish
(:472-501), French (:502-531), German (:532-561).  Weighting matches the
reference: ``pii + clean*2 + mixed`` (:302-304, :471, :501, :531, :561).
Language mix: hebrew_ratio=0.4, remainder split over en/es/fr/de
(config.yaml:29-30, dataset_creation.py:715-719).

Each template is ``(template_string, [entity_types_in_appearance_order])``.
Placeholder appearance order equals the entity list order in every reference
template — fixture generation relies on this for exact span bookkeeping.
"""

from __future__ import annotations

Template = tuple[str, list[str]]

HE_PII: list[Template] = [
    ("שמי {NAME} ומספר תעודת הזהות שלי הוא {ID_NUMBER}", ["NAME", "ID_NUMBER"]),
    ("אני {NAME}, הטלפון שלי {PHONE} והמייל {EMAIL}", ["NAME", "PHONE", "EMAIL"]),
    ("הכתובת של {NAME} היא {ADDRESS}", ["NAME", "ADDRESS"]),
    ("נולדתי ב-{DATE_OF_BIRTH}, השם שלי {NAME}", ["DATE_OF_BIRTH", "NAME"]),
    ("מספר הדרכון של {NAME} הוא {PASSPORT}", ["NAME", "PASSPORT"]),
    ("אני {NAME} ומספר כרטיס האשראי שלי הוא {CREDIT_CARD}", ["NAME", "CREDIT_CARD"]),
    ("חשבון הבנק של {NAME} הוא {BANK_ACCOUNT}", ["NAME", "BANK_ACCOUNT"]),
    ("מספר הרכב של {NAME} הוא {LICENSE_PLATE}", ["NAME", "LICENSE_PLATE"]),
    ("שלום, קוראים לי {NAME} ואני גר ב{ADDRESS}. הטלפון שלי הוא {PHONE}",
     ["NAME", "ADDRESS", "PHONE"]),
    ("לפרטים נוספים: {NAME}, ת.ז. {ID_NUMBER}, טלפון {PHONE}",
     ["NAME", "ID_NUMBER", "PHONE"]),
    ("בתאריך {DATE_OF_BIRTH} נולד {NAME}, תושב {ADDRESS}",
     ["DATE_OF_BIRTH", "NAME", "ADDRESS"]),
    ("ניתן ליצור קשר עם {NAME} במייל {EMAIL} או בטלפון {PHONE}",
     ["NAME", "EMAIL", "PHONE"]),
]

HE_CLEAN: list[Template] = [
    ("אני אוהב לתכנת בפייתון והספרייה המועדפת עלי היא NumPy", []),
    ("היום למדתי על למידת מכונה ובינה מלאכותית", []),
    ("האתר שלי נמצא בכתובת ובו אפשר למצוא מידע על פרויקטים", []),
    ("אני עובד עם מסד נתונים גדול ומשתמש בכלים שונים לניתוח", []),
    ("הטכנולוגיה שאני הכי אוהב היא React ו-JavaScript", []),
    ("המחשב שלי רץ על מערכת הפעלה לינוקס ואני משתמש בטרמינל", []),
    ("השפה המועדפת עלי לפיתוח היא Python וGo", []),
    ("אני עובד בחברת טכנולוגיה ומפתח אפליקציות ווב", []),
    ("הפרויקט שלי כולל שרת Node.js ומסד נתונים MongoDB", []),
    ("אני אוהב לקרוא ספרים על אלגוריתמים ומבני נתונים", []),
]

HE_MIXED: list[Template] = [
    ("שלום, אני {NAME} ואני עובד כמתכנת Python ב-Google. אפשר ליצור קשר במייל {EMAIL}",
     ["NAME", "EMAIL"]),
    ("המפתח {NAME} יצר ספרייה נהדרת בשם TensorFlow, ניתן ליצור קשר בטלפון {PHONE}",
     ["NAME", "PHONE"]),
    ("אני {NAME} ואני אוהב לעבוד עם Docker ו-Kubernetes בפרויקטים שלי", ["NAME"]),
    ("המהנדס {NAME} פיתח API מעולה ב-Flask, הכתובת שלו היא {ADDRESS}",
     ["NAME", "ADDRESS"]),
    ("אני משתמש ב-Git ו-GitHub לניהול הקוד, השם שלי {NAME} ואימייל {EMAIL}",
     ["NAME", "EMAIL"]),
]

EN_PII: list[Template] = [
    ("My name is {NAME} and my ID number is {ID_NUMBER}", ["NAME", "ID_NUMBER"]),
    ("I am {NAME}, my phone is {PHONE} and email is {EMAIL}",
     ["NAME", "PHONE", "EMAIL"]),
    ("The address of {NAME} is {ADDRESS}", ["NAME", "ADDRESS"]),
    ("Born on {DATE_OF_BIRTH}, my name is {NAME}", ["DATE_OF_BIRTH", "NAME"]),
    ("Contact {NAME} at {EMAIL} or call {PHONE}", ["NAME", "EMAIL", "PHONE"]),
]

EN_CLEAN: list[Template] = [
    ("I love programming in Python and my favorite library is NumPy", []),
    ("Today I learned about machine learning and artificial intelligence", []),
    ("You can visit my website to find information about my projects", []),
    ("I work with large databases and use various tools for analysis", []),
    ("My favorite technology stack is React and JavaScript", []),
    ("My computer runs on Linux and I use the terminal regularly", []),
    ("My preferred programming language is Python and Go", []),
    ("I work at a tech company developing web applications", []),
    ("My project includes a Node.js server and MongoDB database", []),
    ("I enjoy reading books about algorithms and data structures", []),
]

EN_MIXED: list[Template] = [
    ("Hello, I'm {NAME} and I work as a Python developer at Google. "
     "You can reach me at {EMAIL}", ["NAME", "EMAIL"]),
    ("The developer {NAME} created an amazing library called TensorFlow, "
     "contact at {PHONE}", ["NAME", "PHONE"]),
    ("I'm {NAME} and I love working with Docker and Kubernetes in my projects",
     ["NAME"]),
    ("Engineer {NAME} developed an excellent API in Flask, address is {ADDRESS}",
     ["NAME", "ADDRESS"]),
    ("I use Git and GitHub for code management, my name is {NAME} and email {EMAIL}",
     ["NAME", "EMAIL"]),
]

ES_PII: list[Template] = [
    ("Mi nombre es {NAME} y mi número de ID es {ID_NUMBER}", ["NAME", "ID_NUMBER"]),
    ("Soy {NAME}, mi teléfono es {PHONE} y mi correo es {EMAIL}",
     ["NAME", "PHONE", "EMAIL"]),
    ("La dirección de {NAME} es {ADDRESS}", ["NAME", "ADDRESS"]),
]

ES_CLEAN: list[Template] = [
    ("Me encanta programar en Python y mi biblioteca favorita es NumPy", []),
    ("Trabajo con bases de datos grandes y uso varias herramientas para análisis", []),
    ("Mi tecnología favorita es React y JavaScript", []),
]

FR_PII: list[Template] = [
    ("Je m'appelle {NAME} et mon numéro d'identification est {ID_NUMBER}",
     ["NAME", "ID_NUMBER"]),
    ("Je suis {NAME}, mon téléphone est {PHONE} et mon email est {EMAIL}",
     ["NAME", "PHONE", "EMAIL"]),
    ("L'adresse de {NAME} est {ADDRESS}", ["NAME", "ADDRESS"]),
]

FR_CLEAN: list[Template] = [
    ("J'adore programmer en Python et ma bibliothèque préférée est NumPy", []),
    ("Je travaille avec de grandes bases de données et j'utilise divers outils d'analyse", []),
    ("Ma technologie préférée est React et JavaScript", []),
]

DE_PII: list[Template] = [
    ("Mein Name ist {NAME} und meine ID-Nummer ist {ID_NUMBER}",
     ["NAME", "ID_NUMBER"]),
    ("Ich bin {NAME}, meine Telefonnummer ist {PHONE} und meine E-Mail ist {EMAIL}",
     ["NAME", "PHONE", "EMAIL"]),
    ("Die Adresse von {NAME} ist {ADDRESS}", ["NAME", "ADDRESS"]),
]

DE_CLEAN: list[Template] = [
    ("Ich programmiere gerne in Python und meine Lieblingsbibliothek ist NumPy", []),
    ("Ich arbeite mit großen Datenbanken und verwende verschiedene Analysetools", []),
    ("Meine bevorzugte Technologie ist React und JavaScript", []),
]


def templates_for(language: str) -> list[Template]:
    """Weighted template list per language (pii + clean*2 + mixed)."""
    if language == "he":
        return HE_PII + HE_CLEAN * 2 + HE_MIXED
    if language == "en":
        return EN_PII + EN_CLEAN * 2 + EN_MIXED
    if language == "es":
        return ES_PII + ES_CLEAN * 2
    if language == "fr":
        return FR_PII + FR_CLEAN * 2
    if language == "de":
        return DE_PII + DE_CLEAN * 2
    return []


LANGUAGES = ["he", "en", "es", "fr", "de"]
HEBREW_RATIO = 0.4  # config.yaml:30
