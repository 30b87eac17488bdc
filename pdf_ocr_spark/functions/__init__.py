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


_NAMED_COLORS = {
    # docpact html_extractor.py:117-130 named subset, scaled to 0-255
    "red": (255, 0, 0),
    "green": (0, 128, 0),
    "blue": (0, 0, 255),
    "yellow": (255, 255, 0),
    "orange": (255, 166, 0),
    "gray": (128, 128, 128),
    "grey": (128, 128, 128),
    "lightgray": (212, 212, 212),
    "lightgrey": (212, 212, 212),
    "darkgray": (168, 168, 168),
    "darkgrey": (168, 168, 168),
}

_RGB_RE = r"^rgb\s*\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)"


def parse_css_color(c: Column) -> Column:
    """CSS color string -> struct(r, g, b) ints in 0-255, NULL for
    transparent/inherit/initial/none, white, and unparseable input
    (docpact html_extractor.py:71-132 semantics, fully columnar: hex
    #RGB/#RRGGBB via conv(), rgb(R,G,B) via anchored regexp_extract,
    named subset via a CASE chain)."""
    s = F.lower(F.trim(c))
    hex6 = F.when(
        s.rlike(r"^#[0-9a-f]{6}$"), F.substring(s, 2, 6)
    ).when(
        s.rlike(r"^#[0-9a-f]{3}$"),
        F.concat(
            *[
                F.concat(F.substring(s, i, 1), F.substring(s, i, 1))
                for i in (2, 3, 4)
            ]
        ),
    )

    def _hex_ch(pos: int) -> Column:
        return F.conv(F.substring(hex6, pos, 2), 16, 10).cast("int")

    rgb_ch = [
        # regexp_extract yields '' on no match; try_cast -> NULL (ANSI)
        F.regexp_extract(s, _RGB_RE, i).try_cast("int") for i in (1, 2, 3)
    ]
    named = [None, None, None]
    for ch in range(3):
        expr = F.lit(None).cast("int")
        for name, rgb in _NAMED_COLORS.items():
            expr = F.when(s == name, F.lit(rgb[ch])).otherwise(expr)
        named[ch] = expr
    r = F.coalesce(_hex_ch(1), rgb_ch[0], named[0])
    g = F.coalesce(_hex_ch(3), rgb_ch[1], named[1])
    b = F.coalesce(_hex_ch(5), rgb_ch[2], named[2])
    out = F.struct(r.alias("r"), g.alias("g"), b.alias("b"))
    return F.when(
        r.isNull() | g.isNull() | b.isNull()
        | ((r == 255) & (g == 255) & (b == 255)),
        F.lit(None).cast("struct<r:int,g:int,b:int>"),
    ).otherwise(out)
