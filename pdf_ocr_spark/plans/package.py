"""spark-submit --py-files packaging (north_rule requirement).

Executors do not inherit driver-side ``sys.path`` mutations — the engine
must ship as a zip. Either pass ``--py-files $(python -m
pdf_ocr_spark.plans.package)`` to spark-submit, or let
``session.get_spark(ship_package=True)`` call ``addPyFile`` at startup.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the pdf_ocr_spark package for --py-files; returns the path."""
    dest = dest or os.path.join(tempfile.gettempdir(), "pdf_ocr_spark.zip")
    base = os.path.dirname(_PKG_ROOT)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(_PKG_ROOT):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, base))
    return dest


if __name__ == "__main__":
    print(build_pyfiles_zip())
