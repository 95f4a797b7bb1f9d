"""Build dist/pii_redactor_spark.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pii_redactor_spark"


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(ROOT, PKG)
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                # .json: checked-in runtime data (the shared-table pins)
                # must ship with the package or the zip deployment breaks
                if fn.endswith((".py", ".json")):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, ROOT)
                    zf.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
