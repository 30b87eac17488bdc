"""Columnar scalar-function library — JVM-side (Catalyst/codegen) twins of
the Python kernels in ``pdf_ocr_spark.kernels.normalize``. These are the
hot-path versions (SURVEY.md §2.8): no Python is involved at runtime.

  normalize_col ......... docpact normalize.py:14-46
  cell_type_col ......... docpact heuristics.py:117-172 (DATE/NUMBER/STRING)
  coerce_number_col ..... docpact serialize.py:435-495
  parse_date_multi ...... docpact serialize.py:107-189 (18-format coalesce)
  string_format_col ..... docpact serialize.py:284-337
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# NBSP/smart-quote/dash/zero-width maps (same table as kernels.normalize)
_TRANSLATE_SRC = " ‘’“”–—"
_TRANSLATE_DST = " ''\"\"--"
_ZW = "[​‌‍﻿]"


def normalize_col(c: Column) -> Column:
    """Lossless idempotent normalization, fully columnar."""
    c = F.regexp_replace(c, _ZW, "")
    c = F.translate(c, _TRANSLATE_SRC, _TRANSLATE_DST)
    c = F.regexp_replace(c, " {2,}", " ")
    return F.trim(c)


_DATE_PATTERNS = [
    r"^\d{4}-\d{2}-\d{2}$",
    r"^\d{1,2}/\d{1,2}/\d{2,4}$",
    r"^\d{1,2}-(?i)(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)-\d{2,4}$",
]
_NUMBER_PATTERN = r"^\(?[+-]?[$€£]?\s?\d{1,3}([ ,.]\d{3})*([.,]\d+)?%?\)?$"


def cell_type_col(c: Column) -> Column:
    c = F.trim(c)
    date_match = F.lit(False)
    for p in _DATE_PATTERNS:
        date_match = date_match | c.rlike(p)
    return (
        F.when(c == "", "STRING")
        .when(date_match, "DATE")
        .when(c.rlike(_NUMBER_PATTERN), "NUMBER")
        .otherwise("STRING")
    )


def coerce_number_col(c: Column) -> Column:
    """US/EU separators, currency, percent, accounting negatives → DOUBLE
    (null when not numeric). Columnar analogue of kernels coerce_value."""
    s = F.trim(c)
    neg = s.rlike(r"^\(.*\)$")
    s = F.regexp_replace(s, r"^\((.*)\)$", r"$1")
    s = F.regexp_replace(s, r"[$€£%\s ]", "")
    # EU decimal comma: trailing comma group of 1-2 digits, no dot
    eu = s.rlike(r"^[+-]?[\d,]*,\d{1,2}$") & ~s.contains(".")
    s = F.when(
        eu, F.concat(F.regexp_replace(F.regexp_extract(s, r"^(.*),(\d{1,2})$", 1), ",", ""),
                     F.lit("."), F.regexp_extract(s, r"^(.*),(\d{1,2})$", 2))
    ).otherwise(F.regexp_replace(s, ",", ""))
    v = s.try_cast("double")
    return F.when(neg, -v).otherwise(v)


_DATE_FMTS = ["yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "dd-MMM-yy", "dd-MMM-yyyy",
              "MMM d, yyyy", "d MMM yyyy", "yyyyMMdd"]


def parse_date_multi(c: Column) -> Column:
    """Multi-format date parse: coalesce over try_to_timestamp chain."""
    attempts = [F.try_to_timestamp(c, F.lit(f)) for f in _DATE_FMTS]
    return F.coalesce(*attempts)


def string_format_col(c: Column, style: str) -> Column:
    if style == "upper":
        return F.upper(c)
    if style == "lower":
        return F.lower(c)
    if style == "title":
        return F.initcap(c)
    if style == "trim":
        return F.trim(c)
    if style == "snake":
        return F.lower(F.regexp_replace(F.trim(c), r"\s+", "_"))
    if style == "kebab":
        return F.lower(F.regexp_replace(F.trim(c), r"\s+", "-"))
    raise ValueError(f"unknown style {style!r}")


_OCR_TOKEN_RE = r"[0-9OolISB.,]+"
_OCR_FROM = "OolISB"
_OCR_TO = "001158"


def ocr_repair_col(c: Column) -> Column:
    """OCR confusion repair (north_star "OCR-text span recovery"):
    within number-shaped tokens, map the classic glyph confusions
    O→0 o→0 l→1 I→1 S→5 B→8; word tokens pass through untouched.
    Fully columnar: split → transform(CASE … translate) → concat."""
    toks = F.split(c, " ")
    fixed = F.transform(
        toks,
        lambda t: F.when(
            t.rlike(f"^{_OCR_TOKEN_RE}$") & t.rlike("[0-9OolISB]"),
            F.translate(t, _OCR_FROM, _OCR_TO),
        ).otherwise(t),
    )
    return F.concat_ws(" ", fixed)
