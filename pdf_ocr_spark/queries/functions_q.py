"""Scalar-function queries (SURVEY.md §2.8): normalization, cell-type
lattice, number coercion, multi-format dates, fuzzy distance, regex
extraction, JSON access — each with a DuckDB twin."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions import cell_type_col, coerce_number_col, normalize_col
from .base import sql_dsum_expr, t

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


@q(
    "q27_normalize_text",
    oracle="""
SELECT doc_id,
       TRIM(REGEXP_REPLACE(
         REPLACE(REPLACE(REPLACE(
           REGEXP_REPLACE(text || CHR(160) || ' “x”  –  y​z', '[​‌‍﻿]', '', 'g'),
           CHR(160), ' '), '“', '"'), '”', '"')
         .replace('–', '-'),
         ' {2,}', ' ', 'g')) AS norm_text
FROM documents
""",
)
def q27(spark, sf):
    """normalization chain (docpact normalize.py:14-46) — messy suffix is
    appended so the chain has real work to do."""
    d = t(spark, sf, "documents")
    messy = F.concat(
        F.col("text"), F.lit("  “x”  –  y​z")
    )
    return d.select("doc_id", normalize_col(messy).alias("norm_text"))


@q(
    "q28_cell_type_lattice",
    oracle="""
WITH cells AS (
  SELECT STRFTIME(l_shipdate, '%Y-%m-%d') AS c FROM lineitem
  UNION ALL SELECT CAST(l_quantity AS VARCHAR) FROM lineitem
  UNION ALL SELECT l_returnflag FROM lineitem)
SELECT CASE
         WHEN REGEXP_MATCHES(TRIM(c), '^\\d{4}-\\d{2}-\\d{2}$') THEN 'DATE'
         WHEN REGEXP_MATCHES(TRIM(c), '^\\(?[+-]?[$€£]?\\s?\\d{1,3}([ ,.]\\d{3})*([.,]\\d+)?%?\\)?$') THEN 'NUMBER'
         ELSE 'STRING'
       END AS cell_type,
       COUNT(*) AS n
FROM cells GROUP BY 1
""",
)
def q28(spark, sf):
    """CellType lattice (docpact heuristics.py:117-172) over a synthetic
    cell stream built from real columns."""
    li = t(spark, sf, "lineitem")
    dates = li.select(F.date_format("l_shipdate", "yyyy-MM-dd").alias("c"))
    nums = li.select(F.col("l_quantity").cast("string").alias("c"))
    strs = li.select(F.col("l_returnflag").alias("c"))
    cells = dates.unionAll(nums).unionAll(strs)
    return cells.select(cell_type_col(F.col("c")).alias("cell_type")).groupBy(
        "cell_type"
    ).agg(F.count("*").alias("n"))


_COERCE_SQL = r"""
  CASE WHEN REGEXP_MATCHES(cell, '^\(.*\)$')
       THEN -TRY_CAST(REGEXP_REPLACE(REGEXP_REPLACE(cell, '^\((.*)\)$', '\1', 'g'), '[$,]', '', 'g') AS DOUBLE)
       ELSE TRY_CAST(
         CASE WHEN REGEXP_MATCHES(REGEXP_REPLACE(cell, '[$]', '', 'g'), '^[+-]?[0-9,]*,[0-9]{1,2}$')
                   AND NOT CONTAINS(cell, '.')
              THEN REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(cell, '[$]', '', 'g'), '^(.*),([0-9]{1,2})$', '\1#\2', 'g'), ',', '', 'g'), '#', '.')
              ELSE REGEXP_REPLACE(REGEXP_REPLACE(cell, '[$]', '', 'g'), ',', '', 'g')
         END AS DOUBLE)
  END"""

_Q29_ORACLE = """
WITH formatted AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN
                CAST(CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS VARCHAR) || ',' ||
                LPAD(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) % 1000 AS VARCHAR), 3, '0')
              WHEN o_orderkey % 4 = 1 THEN '(' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR) || ')'
              WHEN o_orderkey % 4 = 2 THEN '$' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)
              ELSE CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR) || ',5'
         END AS cell
  FROM orders)
SELECT {dsum} AS total_coerced,
  COUNT(*) AS n
FROM formatted
""".format(dsum=sql_dsum_expr(_COERCE_SQL, 2))


@q("q29_number_coercion", oracle=_Q29_ORACLE)
def q29(spark, sf):
    """value coercion round-trip (docpact serialize.py:435-495): format
    numbers as messy strings (US thousands / accounting parens / currency /
    EU decimal), coerce back columnar, sum exactly."""
    o = t(spark, sf, "orders")
    ok = F.col("o_orderkey")
    ip = F.floor(F.col("o_totalprice")).cast("bigint")
    us = F.concat(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").cast("string"),
        F.lit(","),
        F.lpad((ip % 1000).cast("string"), 3, "0"),
    )
    cell = (
        F.when(ok % 4 == 0, us)
        .when(ok % 4 == 1, F.concat(F.lit("("), ip.cast("string"), F.lit(")")))
        .when(ok % 4 == 2, F.concat(F.lit("$"), ip.cast("string")))
        .otherwise(F.concat(ip.cast("string"), F.lit(",5")))
    )
    coerced = coerce_number_col(cell)
    return o.select(cell.alias("cell"), coerced.alias("v")).agg(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("total_coerced"),
        F.count("*").alias("n"),
    )


@q(
    "q30_date_roundtrip",
    oracle="""
SELECT STRFTIME(STRPTIME(STRFTIME(o_orderdate, '%d-%b-%Y'), '%d-%b-%Y'),
                '%Y-%m-%d') AS iso_date,
       COUNT(*) AS n
FROM orders GROUP BY 1
""",
)
def q30(spark, sf):
    """multi-format date parse/format (docpact serialize.py:107-189):
    format to '15-Mar-1995', parse back through the coalesce chain, emit
    ISO."""
    from ..functions import parse_date_multi

    o = t(spark, sf, "orders")
    noisy = F.date_format("o_orderdate", "dd-MMM-yyyy")
    return (
        o.select(
            F.date_format(parse_date_multi(noisy), "yyyy-MM-dd").alias("iso_date")
        )
        .groupBy("iso_date")
        .agg(F.count("*").alias("n"))
    )


@q(
    "q31_levenshtein",
    oracle="""
SELECT c_mktsegment,
       MIN(LEVENSHTEIN(c_name, 'Customer#000000042')) AS min_dist,
       MAX(LEVENSHTEIN(c_name, 'Customer#000000042')) AS max_dist
FROM customer GROUP BY c_mktsegment
""",
)
def q31(spark, sf):
    """edit-distance scoring — builtin analogue of the reference's fuzzy
    matching (docpact filter.py:130-160 uses rapidfuzz WRatio; the
    vectorized-rapidfuzz variant is q45, rows-only)."""
    c = t(spark, sf, "customer")
    d = F.levenshtein("c_name", F.lit("Customer#000000042"))
    return c.groupBy("c_mktsegment").agg(
        F.min(d).alias("min_dist"), F.max(d).alias("max_dist")
    )


@q(
    "q32_regex_extract_ids",
    oracle="""
SELECT c_mktsegment,
       CAST(SUM(CAST(REGEXP_EXTRACT(c_name, 'Customer#(\\d+)', 1) AS BIGINT)) AS BIGINT) AS id_sum,
       COUNT(*) AS n
FROM customer GROUP BY c_mktsegment
""",
)
def q32(spark, sf):
    """regexp_extract (docpact heuristics.py:442-603 RH-pattern family)."""
    c = t(spark, sf, "customer")
    cid = F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint")
    return c.groupBy("c_mktsegment").agg(
        F.sum(cid).alias("id_sum"), F.count("*").alias("n")
    )


@q(
    "q33_json_props",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def q33(spark, sf):
    """per-row JSON access (the reference only loads contract JSON on the
    driver — contracts.py:113; this is the row-level generalization)."""
    e = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.count("*").alias("n")
    )


@q(
    "q34_string_formats",
    oracle="""
SELECT UPPER(c_mktsegment) AS up, LOWER(c_mktsegment) AS lo,
       REPLACE(LOWER(TRIM(c_mktsegment)), ' ', '_') AS snake,
       COUNT(*) AS n
FROM customer GROUP BY 1, 2, 3
""",
)
def q34(spark, sf):
    """string case formats (docpact serialize.py:284-337)."""
    from ..functions import string_format_col

    c = t(spark, sf, "customer")
    seg = F.col("c_mktsegment")
    return c.groupBy(
        string_format_col(seg, "upper").alias("up"),
        string_format_col(seg, "lower").alias("lo"),
        string_format_col(seg, "snake").alias("snake"),
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------- q38
_CT_SQL = """CASE
         WHEN REGEXP_MATCHES(TRIM(cell), '^\\d{4}-\\d{2}-\\d{2}$') THEN 'DATE'
         WHEN REGEXP_MATCHES(TRIM(cell), '^\\(?[+-]?[$€£]?\\s?\\d{1,3}([ ,.]\\d{3})*([.,]\\d+)?%?\\)?$') THEN 'NUMBER'
         ELSE 'STRING'
       END"""

_Q38_ORACLE = f"""
WITH cells AS (
  SELECT 'l_shipdate' AS col_name, STRFTIME(l_shipdate, '%Y-%m-%d') AS cell
  FROM lineitem
  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR) FROM lineitem
  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
),
typed AS (SELECT col_name, cell, {_CT_SQL} AS cell_type FROM cells),
votes AS (SELECT col_name, cell_type, count(*) AS n
          FROM typed GROUP BY 1, 2),
pred AS (SELECT col_name, cell_type FROM (
           SELECT col_name, cell_type,
                  row_number() OVER (PARTITION BY col_name
                                     ORDER BY n DESC, cell_type) AS rn
           FROM votes) WHERE rn = 1),
stats AS (SELECT col_name, count(*) AS n_cells,
                 count(DISTINCT cell) AS n_distinct
          FROM typed GROUP BY 1)
SELECT s.col_name, p.cell_type AS predominant_type, s.n_cells, s.n_distinct,
       (s.n_distinct <= 5
        OR CAST(s.n_distinct AS DOUBLE) / s.n_cells <= 0.1) AS is_enum
FROM stats s JOIN pred p ON p.col_name = s.col_name
"""


@q("q38_column_type_profile", oracle=_Q38_ORACLE)
def q38(spark, sf):
    """Column type-consistency profile (docpact heuristics.py:175-239,
    TH3): per column, the predominant CellType by vote (deterministic
    tie-break) plus the ENUM test — distinct <= 5 or distinct/total
    <= 0.1. Exact distinct here for the cross-engine oracle; at 100 TB
    the reference's own tolerance makes this approx_count_distinct (the
    q25/q26 sketch path) with no shape change: both are one shuffle on
    col_name with map-side partials."""
    li = t(spark, sf, "lineitem")
    cells = (
        li.select(
            F.lit("l_shipdate").alias("col_name"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("cell"),
        )
        .unionAll(
            li.select(
                F.lit("l_quantity"), F.col("l_quantity").cast("string")
            )
        )
        .unionAll(li.select(F.lit("l_returnflag"), F.col("l_returnflag")))
        .unionAll(li.select(F.lit("l_linestatus"), F.col("l_linestatus")))
    )
    typed = cells.select(
        "col_name", "cell", cell_type_col(F.col("cell")).alias("cell_type")
    )
    votes = typed.groupBy("col_name", "cell_type").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("col_name").orderBy(
        F.desc("n"), F.asc("cell_type")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("col_name", F.col("cell_type").alias("predominant_type"))
    )
    stats = typed.groupBy("col_name").agg(
        F.count("*").alias("n_cells"),
        F.countDistinct("cell").alias("n_distinct"),
    )
    return stats.join(pred, "col_name").select(
        "col_name",
        "predominant_type",
        "n_cells",
        "n_distinct",
        (
            (F.col("n_distinct") <= 5)
            | (F.col("n_distinct").cast("double") / F.col("n_cells") <= 0.1)
        ).alias("is_enum"),
    )


# ---------------------------------------------------------------- p01
# RH1/RH4/RH5 pattern library (docpact heuristics.py:442-603), adapted
# to one capture group per pattern so the Java (Spark) and RE2 (DuckDB)
# engines extract identically. No lookaround/backrefs anywhere.
_META_PATTERNS = [
    ("as_of_date", r"[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})"),
    (
        "period_end",
        r"[Ff]or the (?:year|period|quarter) ended? ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})",
    ),
    ("quarter", r"\b(Q[1-4] ?(?:FY)?[0-9]{2,4})"),
    ("fiscal_year", r"\bFY ?([0-9]{2,4})"),
    ("unit_scale", r"\(in (thousands|millions|billions)\)"),
    ("currency_code", r"\b(USD|EUR|GBP|AUD)\b"),
    ("tonnage", r"([0-9,]+(?:\.[0-9]+)?) ?MT\b"),
    ("footnote_marker", r"(\*+|†|‡)$"),
]

_P01_LINES_SQL = """
  SELECT o_orderkey AS line_id,
         CASE o_orderkey % 8
           WHEN 0 THEN 'As of ' || strftime(o_orderdate, '%B %-d, %Y')
           WHEN 1 THEN 'For the year ended ' || strftime(o_orderdate, '%B %-d, %Y')
           WHEN 2 THEN 'Q' || CAST((month(o_orderdate) + 2) // 3 AS VARCHAR)
                     || ' FY' || strftime(o_orderdate, '%y')
           WHEN 3 THEN 'FY ' || strftime(o_orderdate, '%Y')
           WHEN 4 THEN 'Revenue (in millions)'
           WHEN 5 THEN 'USD settlement'
           WHEN 6 THEN CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || ' MT'
           ELSE 'Total*'
         END AS line
  FROM orders
"""

_P01_ORACLE = "WITH lines AS (" + _P01_LINES_SQL + ")\n" + "\nUNION ALL\n".join(
    f"""SELECT line_id, '{name}' AS pattern,
       regexp_extract(line, '{rx.replace("'", "''")}', 1) AS captured
FROM lines WHERE regexp_matches(line, '{rx.replace("'", "''")}')"""
    for name, rx in _META_PATTERNS
)


@q("p01_metadata_patterns", oracle=_P01_ORACLE)
def p01(spark, sf):
    """Temporal / unit-currency / footnote-marker pattern detection (RH1
    docpact heuristics.py:442-506, RH4 514-562, RH5 570-603) over a
    deterministic line stream composed from the orders table. Each
    pattern is a scan-local regexp filter + extract — narrow maps, no
    shuffle; at scale the union branches share one scan (Catalyst reuses
    the exchange-free subplan)."""
    o = t(spark, sf, "orders")
    qtr = ((F.month("o_orderdate") + 2) / 3).cast("int").cast("string")
    lines = o.select(
        F.col("o_orderkey").alias("line_id"),
        F.when(
            F.col("o_orderkey") % 8 == 0,
            F.concat(F.lit("As of "), F.date_format("o_orderdate", "MMMM d, yyyy")),
        )
        .when(
            F.col("o_orderkey") % 8 == 1,
            F.concat(
                F.lit("For the year ended "),
                F.date_format("o_orderdate", "MMMM d, yyyy"),
            ),
        )
        .when(
            F.col("o_orderkey") % 8 == 2,
            F.concat(
                F.lit("Q"), qtr, F.lit(" FY"), F.date_format("o_orderdate", "yy")
            ),
        )
        .when(
            F.col("o_orderkey") % 8 == 3,
            F.concat(F.lit("FY "), F.date_format("o_orderdate", "yyyy")),
        )
        .when(F.col("o_orderkey") % 8 == 4, F.lit("Revenue (in millions)"))
        .when(F.col("o_orderkey") % 8 == 5, F.lit("USD settlement"))
        .when(
            F.col("o_orderkey") % 8 == 6,
            F.concat(
                F.floor("o_totalprice").cast("bigint").cast("string"), F.lit(" MT")
            ),
        )
        .otherwise(F.lit("Total*"))
        .alias("line"),
    )
    parts = [
        lines.filter(F.col("line").rlike(rx)).select(
            "line_id",
            F.lit(name).alias("pattern"),
            F.regexp_extract("line", rx, 1).alias("captured"),
        )
        for name, rx in _META_PATTERNS
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionAll(pdf)
    return out


# ---------------------------------------------------------------- q39
_Q39_ORACLE = """
WITH v AS (
  SELECT o_orderkey, round(o_totalprice - 200000.0, 2) AS amount
  FROM orders
),
c AS (
  SELECT o_orderkey, amount,
         CAST(round(abs(amount) * 100) AS BIGINT) AS cents
  FROM v
),
f AS (
  SELECT o_orderkey, amount,
         format('{:,}', cents // 100) || '.'
           || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS us_abs
  FROM c
)
SELECT o_orderkey,
       CASE WHEN amount < 0 THEN '(' || us_abs || ')' ELSE us_abs END
         AS us_accounting,
       translate(us_abs, ',.', '.,') AS eu_plain
FROM f
"""


@q("q39_number_format", oracle=_Q39_ORACLE)
def q39(spark, sf):
    """Number-format rendering (docpact serialize.py:192-268 + 390-432
    semantics): #,###.## US grouping, accounting parentheses for
    negatives, EU separator swap — all scalar expressions (format_number
    + translate), no UDF. Inputs carry exactly 2 decimals so both
    engines' nearest-representation rounding agrees (no .5 ties)."""
    v = t(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") - 200000.0, 2).alias("amount"),
    )
    us_abs = F.format_number(F.abs(F.col("amount")), 2)
    return v.select(
        "o_orderkey",
        F.when(
            F.col("amount") < 0, F.concat(F.lit("("), us_abs, F.lit(")"))
        )
        .otherwise(us_abs)
        .alias("us_accounting"),
        F.translate(us_abs, ",.", ".,").alias("eu_plain"),
    )


# ---------------------------------------------------------------- p02
_P02_NAMED = [
    "red", "green", "blue", "yellow", "orange", "gray", "grey",
    "lightgray", "lightgrey", "darkgray", "darkgrey",
]

_P02_SRC_SQL = """
  SELECT p_brand, p_partkey,
    CASE CAST(p_partkey % 6 AS INTEGER)
      WHEN 0 THEN '#ffffff'
      WHEN 1 THEN '#' || substr(md5(p_name), 1, 6)
      WHEN 2 THEN '#' || substr(md5(p_name), 1, 3)
      WHEN 3 THEN 'rgb(' || CAST(p_partkey % 256 AS INTEGER) || ', '
                || CAST((p_partkey * 7) % 256 AS INTEGER) || ', '
                || CAST((p_partkey * 13) % 256 AS INTEGER) || ')'
      WHEN 4 THEN ['red','green','blue','yellow','orange','gray','grey',
                   'lightgray','lightgrey','darkgray','darkgrey']
                  [CAST(p_partkey % 11 AS INTEGER) + 1]
      ELSE 'transparent'
    END AS cstr
  FROM part
"""

_P02_NAMED_CASE = {
    "r": "CASE s WHEN 'red' THEN 255 WHEN 'green' THEN 0 WHEN 'blue' THEN 0"
         " WHEN 'yellow' THEN 255 WHEN 'orange' THEN 255"
         " WHEN 'gray' THEN 128 WHEN 'grey' THEN 128"
         " WHEN 'lightgray' THEN 212 WHEN 'lightgrey' THEN 212"
         " WHEN 'darkgray' THEN 168 WHEN 'darkgrey' THEN 168 END",
    "g": "CASE s WHEN 'red' THEN 0 WHEN 'green' THEN 128 WHEN 'blue' THEN 0"
         " WHEN 'yellow' THEN 255 WHEN 'orange' THEN 166"
         " WHEN 'gray' THEN 128 WHEN 'grey' THEN 128"
         " WHEN 'lightgray' THEN 212 WHEN 'lightgrey' THEN 212"
         " WHEN 'darkgray' THEN 168 WHEN 'darkgrey' THEN 168 END",
    "b": "CASE s WHEN 'red' THEN 0 WHEN 'green' THEN 0 WHEN 'blue' THEN 255"
         " WHEN 'yellow' THEN 0 WHEN 'orange' THEN 0"
         " WHEN 'gray' THEN 128 WHEN 'grey' THEN 128"
         " WHEN 'lightgray' THEN 212 WHEN 'lightgrey' THEN 212"
         " WHEN 'darkgray' THEN 168 WHEN 'darkgrey' THEN 168 END",
}


def _p02_chan(pos: int, rgb_group: int, named: str) -> str:
    hx = (
        f"(strpos('0123456789abcdef', substr(hex6, {pos}, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(hex6, {pos + 1}, 1)) - 1"
    )
    rgb = (
        "TRY_CAST(regexp_extract(s,"
        " 'rgb\\s*\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)',"
        f" {rgb_group}) AS INTEGER)"
    )
    return f"CASE WHEN hex6 IS NOT NULL THEN {hx} ELSE coalesce({rgb}, {named}) END"


_P02_ORACLE = f"""
WITH src AS ({_P02_SRC_SQL}),
norm AS (SELECT p_brand, lower(trim(cstr)) AS s FROM src),
hexed AS (
  SELECT p_brand, s,
    CASE WHEN regexp_matches(s, '^#[0-9a-f]{{6}}$') THEN substr(s, 2, 6)
         WHEN regexp_matches(s, '^#[0-9a-f]{{3}}$') THEN
           substr(s,2,1)||substr(s,2,1)||substr(s,3,1)||substr(s,3,1)
           ||substr(s,4,1)||substr(s,4,1)
    END AS hex6
  FROM norm
),
chan AS (
  SELECT p_brand,
    {_p02_chan(1, 1, _P02_NAMED_CASE["r"])} AS r,
    {_p02_chan(3, 2, _P02_NAMED_CASE["g"])} AS g,
    {_p02_chan(5, 3, _P02_NAMED_CASE["b"])} AS b
  FROM hexed
),
flagged AS (
  SELECT p_brand, r, g, b,
    (r IS NOT NULL AND g IS NOT NULL AND b IS NOT NULL
     AND NOT (r = 255 AND g = 255 AND b = 255)) AS valid
  FROM chan
)
SELECT p_brand AS brand,
  CAST(count(*) FILTER (valid) AS BIGINT) AS n_colors,
  CAST(count(*) FILTER (NOT valid) AS BIGINT) AS n_null,
  CAST(coalesce(sum(r) FILTER (valid), 0) AS BIGINT) AS sum_r,
  CAST(coalesce(sum(g) FILTER (valid), 0) AS BIGINT) AS sum_g,
  CAST(coalesce(sum(b) FILTER (valid), 0) AS BIGINT) AS sum_b
FROM flagged GROUP BY p_brand
"""


@q("p02_color_parse", oracle=_P02_ORACLE)
def p02(spark, sf):
    """Color parsing (docpact html_extractor.py:71-132, the FH5 color
    channel's input; int->RGB analogue spatial_text.py:72-80): CSS
    #RRGGBB / #RGB / rgb(R,G,B) / named-subset colors parsed to RGB
    structs ENTIRELY in Catalyst (conv + anchored regexp_extract + CASE
    chain — zero Python), white and transparent/inherit/none dropped to
    NULL exactly as the reference does. Deterministic color strings
    derive from the part table (md5 hex digits, modular rgb components,
    named-color rotation) so both engines generate identical inputs.
    Plan: scan-local projection + one shuffle (brand aggregation)."""
    from .. import functions as FN

    p = t(spark, sf, "part")
    key = F.col("p_partkey")
    named = F.element_at(
        F.array(*[F.lit(n) for n in _P02_NAMED]),
        (key % 11 + 1).cast("int"),
    )
    cstr = (
        F.when(key % 6 == 0, F.lit("#ffffff"))
        .when(key % 6 == 1, F.concat(F.lit("#"), F.substring(F.md5("p_name"), 1, 6)))
        .when(key % 6 == 2, F.concat(F.lit("#"), F.substring(F.md5("p_name"), 1, 3)))
        .when(
            key % 6 == 3,
            F.concat(
                F.lit("rgb("), (key % 256).cast("int").cast("string"),
                F.lit(", "), (key * 7 % 256).cast("int").cast("string"),
                F.lit(", "), (key * 13 % 256).cast("int").cast("string"),
                F.lit(")"),
            ),
        )
        .when(key % 6 == 4, named)
        .otherwise(F.lit("transparent"))
    )
    parsed = p.select("p_brand", FN.parse_css_color(cstr).alias("c"))
    return parsed.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.when(F.col("c").isNotNull(), 1)).alias("n_colors"),
        F.count(F.when(F.col("c").isNull(), 1)).alias("n_null"),
        F.coalesce(F.sum("c.r"), F.lit(0)).alias("sum_r"),
        F.coalesce(F.sum("c.g"), F.lit(0)).alias("sum_g"),
        F.coalesce(F.sum("c.b"), F.lit(0)).alias("sum_b"),
    )
