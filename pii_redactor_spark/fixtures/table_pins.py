"""Fingerprint pins for the data tables SHARED between engine and oracle.

Round-3 verdict #4: ``fixtures.oracle_cache`` re-derives every piece of
*logic* independently, but it still imports the declared *data* tables
(detection/classification regex banks, gazetteers, stopwords, templates,
generator lists) from the engine — so a silently-edited pattern constant
would drift BOTH sides of the correctness gate and never hash-mismatch.

This module closes that hole: every shared table is canonically
serialized, SHA-256'd, and compared against the checked-in digests in
``expected_table_hashes.json`` at oracle-build time
(``assert_shared_tables_pinned``, called from ``oracle_cache``).  An
intentional table change must update the pin file explicitly::

    python -m pii_redactor_spark.fixtures.table_pins --write

which makes the edit visible in review instead of invisible in a both-
sides-same-bug hash match.  The classification bank additionally has a
byte-parity test against the reference source itself
(tests/test_scrub.py), so the pins bottom out in the reference, not in
this repo's history.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

EXPECTED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "expected_table_hashes.json"
)


def _canon(obj) -> str:
    """Canonical serialization for digesting.

    Dict/list order is PRESERVED, not sorted — insertion order is
    semantic for the banks (first-match-wins classification, documented
    detection order), so a reorder must change the digest."""
    if isinstance(obj, re.Pattern):
        return f"re({obj.pattern!r}:{obj.flags})"
    if isinstance(obj, (str, bytes, int, float, bool)) or obj is None:
        return repr(obj)
    if isinstance(obj, (list, tuple, set, frozenset)):
        items = sorted(obj) if isinstance(obj, (set, frozenset)) else obj
        return "[" + ",".join(_canon(x) for x in items) + "]"
    if isinstance(obj, dict):
        return ("{" + ",".join(
            f"{_canon(k)}:{_canon(v)}" for k, v in obj.items()
        ) + "}")
    raise TypeError(f"unpinnable table element type {type(obj)!r}")


def _digest(obj) -> str:
    return hashlib.sha256(_canon(obj).encode()).hexdigest()


def _module_data(mod) -> dict:
    """Every module-level data constant (UPPER_CASE or the documented
    private tables), by name — functions/classes/modules excluded."""
    out = {}
    for name in sorted(vars(mod)):
        if not (name.isupper() or name in ("_STOPWORDS", "_MARKERS")):
            continue
        val = vars(mod)[name]
        if callable(val) or hasattr(val, "__file__"):
            continue
        out[name] = val
    return out


def shared_table_digests() -> dict[str, str]:
    """One digest per shared-data surface the oracle imports."""
    from ..core import gazetteers, generators, langid, patterns
    from ..core.templates import LANGUAGES, templates_for

    return {
        "patterns": _digest(_module_data(patterns)),
        "gazetteers": _digest(_module_data(gazetteers)),
        "langid_tables": _digest({
            "_STOPWORDS": langid._STOPWORDS,
            "_MARKERS": langid._MARKERS,
        }),
        "generators": _digest(_module_data(generators)),
        "templates": _digest(
            {lang: templates_for(lang) for lang in LANGUAGES}
        ),
    }


def _load_expected() -> dict:
    """Read the pin file through importlib.resources so it resolves both
    from the filesystem AND from a ``--py-files`` zip import (a plain
    ``open(__file__)``-relative path can never resolve inside a zip —
    round-4 review fix; ``make_pyfiles`` now packages ``.json`` too)."""
    try:
        from importlib.resources import files

        return json.loads(
            files("pii_redactor_spark.fixtures")
            .joinpath("expected_table_hashes.json")
            .read_text()
        )
    except (OSError, FileNotFoundError) as e:
        raise RuntimeError(
            f"shared-table pin file missing ({EXPECTED_PATH}); regenerate "
            "with `python -m pii_redactor_spark.fixtures.table_pins "
            "--write`"
        ) from e


def assert_shared_tables_pinned() -> None:
    """Raise if any shared table drifted from its checked-in pin."""
    got = shared_table_digests()
    want = _load_expected()
    drifted = sorted(
        k for k in set(got) | set(want) if got.get(k) != want.get(k)
    )
    if drifted:
        raise RuntimeError(
            "shared engine/oracle data tables drifted from their pins: "
            f"{drifted}.  If the change is intentional, re-pin with "
            "`python -m pii_redactor_spark.fixtures.table_pins --write` "
            "and include the pin-file diff in review; an unreviewed "
            "drift here would silently move BOTH sides of the "
            "correctness gate."
        )


def main(argv: list[str]) -> None:
    if "--write" in argv:
        with open(EXPECTED_PATH, "w") as f:
            json.dump(shared_table_digests(), f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {EXPECTED_PATH}")
    else:
        assert_shared_tables_pinned()
        print("shared tables match their pins")


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
