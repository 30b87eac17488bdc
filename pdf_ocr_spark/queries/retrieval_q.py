"""Composed metadata-field retrieval queries (docpact retrieval.py).

p03 chains z01's zone geometry (per-page band filters over the
40-words/page document grid) with p01's regex families through the
``quick_scan`` operator: per field, zones in order -> pages in order ->
custom patterns before category patterns -> first match; fallback
strategies fill the misses. The document stream carries deterministic
injected metadata lines (pure column expressions reproduced verbatim in
the DuckDB oracle), so every resolution branch — zone precedence, page
precedence, custom-vs-category, default and flag fallbacks — is
value-hash-pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.retrieval import field_pattern_plan, quick_scan
from .base import t

QUERIES = {}
ORACLE = {}

_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
_SCALES = ["thousands", "millions", "billions"]
_CURRENCIES = ["USD", "EUR", "GBP", "AUD"]

_AS_OF_RX = r"[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})"
_CURRENCY_RX = r"\b(USD|EUR|GBP|AUD)\b"

P03_FIELDS = [
    {
        "name": "as_of",
        "zones": ["title_page", "page_header"],
        "patterns": [_AS_OF_RX],
        "required": True,
        "fallback": "default",
        "default": "January 1, 2020",
    },
    {
        "name": "period",
        "zones": ["page_header"],
        "category": "temporal",
        "fallback": "flag",
    },
    {"name": "unit", "zones": ["anywhere"], "category": "table_context"},
    {
        "name": "doc_currency",
        "zones": ["page_footer"],
        "patterns": [_CURRENCY_RX],
        "required": True,
        "fallback": "flag",
    },
]

# Deterministic injected metadata lines, keyed by the numeric doc id —
# which docs carry which line in which zone (all on page 0):
#   title : "As of <mon> <day>, <yr>"      when d%3==0
#   header: "As of January 1, 1999"        when d%6==3  (title must win)
#           "As of <mon> <day>, <yr>"      when d%3==1
#           "Q<q> FY<yy>"                  when d%4==1
#   footer: "(in <scale>)"                 when d%2==0
#           "<currency>"                   when d%5==0
# The 'anywhere' zone of page 0 sees every injected line appended after
# the base page words, mirroring the reference's full-page scan.


def _zone_texts(spark, sf):
    """(doc_id, page, zone, zone_text) — z01's band semantics per page
    plus the injected metadata lines above."""
    docs = t(spark, sf, "documents")
    w = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    ).select(
        "doc_id",
        "pos",
        "w",
        (F.col("pos") / 40).cast("int").alias("page"),
        ((F.col("pos") % 40) * 25).alias("y"),
    )

    def agg_zone(df, zone):
        return df.groupBy("doc_id", "page").agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("base")
        ).select("doc_id", "page", F.lit(zone).alias("zone"), "base")

    header = agg_zone(w.filter(F.col("y") < 150), "page_header")
    footer = agg_zone(w.filter(F.col("y") >= 850), "page_footer")
    title = agg_zone(
        w.filter((F.col("page") == 0) & (F.col("y") < 400)), "title_page"
    )
    anywhere = agg_zone(w, "anywhere")
    base = header.unionByName(footer).unionByName(title).unionByName(anywhere)

    d = F.col("doc_id")
    mon = F.element_at(
        F.array(*[F.lit(m) for m in _MONTHS]), (d % 12 + 1).cast("int")
    )
    as_of = F.concat(
        F.lit("As of "), mon, F.lit(" "), (d % 28 + 1).cast("string"),
        F.lit(", "), (d % 6 + 2020).cast("string"),
    )
    quarter = F.concat(
        F.lit("Q"), (d % 4 + 1).cast("string"), F.lit(" FY"),
        (d % 6 + 20).cast("string"),
    )
    scale = F.concat(
        F.lit("(in "),
        F.element_at(F.array(*[F.lit(s) for s in _SCALES]), (d % 3 + 1).cast("int")),
        F.lit(")"),
    )
    currency = F.element_at(
        F.array(*[F.lit(c) for c in _CURRENCIES]), (d % 4 + 1).cast("int")
    )

    def inj(*parts):
        # concat_ws keeps EMPTY strings (it only skips nulls), so
        # collapse + trim to keep spacing identical to the oracle
        return F.trim(
            F.regexp_replace(F.concat_ws(" ", *parts), " +", " ")
        )

    title_inj = F.when(d % 3 == 0, as_of).otherwise(F.lit(""))
    header_inj = inj(
        F.when(d % 6 == 3, F.lit("As of January 1, 1999")).otherwise(F.lit("")),
        F.when(d % 3 == 1, as_of).otherwise(F.lit("")),
        F.when(d % 4 == 1, quarter).otherwise(F.lit("")),
    )
    footer_inj = inj(
        F.when(d % 2 == 0, scale).otherwise(F.lit("")),
        F.when(d % 5 == 0, currency).otherwise(F.lit("")),
    )
    anywhere_inj = inj(title_inj, header_inj, footer_inj)
    injected = (
        F.when(F.col("page") != 0, F.lit(""))
        .when(F.col("zone") == "title_page", title_inj)
        .when(F.col("zone") == "page_header", header_inj)
        .when(F.col("zone") == "page_footer", footer_inj)
        .otherwise(anywhere_inj)
    )
    return base.select(
        "doc_id",
        "page",
        "zone",
        F.trim(
            F.regexp_replace(
                F.concat_ws(" ", F.col("base"), injected), " +", " "
            )
        ).alias("zone_text"),
    )


def p03_quick_scan(spark, sf):
    """Composed per-field metadata retrieval (docpact retrieval.py:
    229-334 quick_scan + 393-430 apply_fallbacks): zone chain -> regex
    families -> fallback, one row per (doc x field)."""
    return quick_scan(_zone_texts(spark, sf), P03_FIELDS)


QUERIES["p03_quick_scan"] = p03_quick_scan


def _p03_oracle() -> str:
    """DuckDB twin: same zone construction, same injected lines, winner
    by ROW_NUMBER over the same precedence vector."""
    branches = []
    for b in field_pattern_plan(P03_FIELDS):
        rx = b["rx"].replace("'", "''")
        branches.append(
            f"""SELECT doc_id, '{b["field"]}' AS field,
       regexp_extract(zone_text, '{rx}', 1) AS value,
       zone AS source_zone, {b["confidence"]} AS confidence,
       '{b["pattern"].replace("'", "''")}' AS pattern,
       {b["zone_rank"]} AS zr, page AS pg, {b["is_category"]} AS ic,
       {b["pattern_rank"]} AS pr
FROM zt WHERE zone = '{b["zone"]}' AND page < 3
  AND regexp_matches(zone_text, '{rx}')"""
        )
    fields_rows = ", ".join(
        "('{}', '{}', {})".format(
            f["name"],
            (f.get("zones") or ["anywhere"])[0],
            "'" + str(f["default"]) + "'"
            if f.get("fallback") == "default" and f.get("default") is not None
            else "NULL",
        )
        for f in P03_FIELDS
    )
    months = ", ".join(f"'{m}'" for m in _MONTHS)
    scales = ", ".join(f"'{s}'" for s in _SCALES)
    curs = ", ".join(f"'{c}'" for c in _CURRENCIES)
    return f"""
WITH w AS (
  SELECT doc_id, pos, w,
         -- integer division: DuckDB CAST(x AS INTEGER) ROUNDS, Spark
         -- cast('int') truncates
         CAST(pos // 40 AS INTEGER) AS page, (pos % 40) * 25 AS y
  FROM (
    SELECT doc_id, ws[pos + 1] AS w, pos
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         LATERAL unnest(generate_series(0, len(ws) - 1)) AS g(pos)
  )
),
zones AS (
  SELECT doc_id, page, 'page_header' AS zone, pos, w FROM w WHERE y < 150
  UNION ALL
  SELECT doc_id, page, 'page_footer', pos, w FROM w WHERE y >= 850
  UNION ALL
  SELECT doc_id, page, 'title_page', pos, w FROM w WHERE page = 0 AND y < 400
  UNION ALL
  SELECT doc_id, page, 'anywhere', pos, w FROM w
),
base AS (
  SELECT doc_id, page, zone, string_agg(w, ' ' ORDER BY pos) AS base
  FROM zones GROUP BY doc_id, page, zone
),
inj AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'As of ' || ([{months}])[CAST(doc_id % 12 + 1 AS INT)]
         || ' ' || CAST(doc_id % 28 + 1 AS VARCHAR) || ', '
         || CAST(doc_id % 6 + 2020 AS VARCHAR) ELSE '' END AS title_inj,
    trim(concat_ws(' ',
      CASE WHEN doc_id % 6 = 3 THEN 'As of January 1, 1999' ELSE '' END,
      CASE WHEN doc_id % 3 = 1 THEN 'As of ' || ([{months}])[CAST(doc_id % 12 + 1 AS INT)]
           || ' ' || CAST(doc_id % 28 + 1 AS VARCHAR) || ', '
           || CAST(doc_id % 6 + 2020 AS VARCHAR) ELSE '' END,
      CASE WHEN doc_id % 4 = 1 THEN 'Q' || CAST(doc_id % 4 + 1 AS VARCHAR)
           || ' FY' || CAST(doc_id % 6 + 20 AS VARCHAR) ELSE '' END)) AS header_inj,
    trim(concat_ws(' ',
      CASE WHEN doc_id % 2 = 0 THEN '(in ' || ([{scales}])[CAST(doc_id % 3 + 1 AS INT)] || ')' ELSE '' END,
      CASE WHEN doc_id % 5 = 0 THEN ([{curs}])[CAST(doc_id % 4 + 1 AS INT)] ELSE '' END)) AS footer_inj
  FROM (SELECT DISTINCT doc_id FROM documents)
),
zt AS (
  SELECT b.doc_id, b.page, b.zone,
    trim(regexp_replace(b.base || CASE
      WHEN b.page != 0 THEN ''
      WHEN b.zone = 'title_page' THEN ' ' || i.title_inj
      WHEN b.zone = 'page_header' THEN ' ' || i.header_inj
      WHEN b.zone = 'page_footer' THEN ' ' || i.footer_inj
      ELSE ' ' || trim(concat_ws(' ', i.title_inj, i.header_inj, i.footer_inj))
    END, ' +', ' ', 'g')) AS zone_text
  FROM base b JOIN inj i USING (doc_id)
),
cand AS (
{chr(10).join("  " + x + (" UNION ALL" if k < len(branches) - 1 else "") for k, x in enumerate(branches))}
),
best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id, field ORDER BY zr, pg, ic, pr) AS rn
    FROM cand
  ) WHERE rn = 1
),
fields(field, first_zone, default_value) AS (VALUES {fields_rows}),
spine AS (
  SELECT d.doc_id, f.* FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN fields f
)
SELECT s.doc_id, s.field,
       CASE WHEN b.doc_id IS NOT NULL THEN b.value
            ELSE s.default_value END AS value,
       coalesce(b.source_zone, s.first_zone) AS source_zone,
       CASE WHEN b.doc_id IS NOT NULL THEN b.confidence
            WHEN s.default_value IS NOT NULL THEN 0.5
            ELSE 0.0 END AS confidence,
       b.pattern AS pattern
FROM spine s LEFT JOIN best b ON b.doc_id = s.doc_id AND b.field = s.field
"""


ORACLE["p03_quick_scan"] = _p03_oracle()


def p04_required_gate(spark, sf):
    """Required-field gate (docpact retrieval.py:340-366
    validate_metadata) over the composed quick_scan output: per doc,
    which required fields stayed unresolved after the fallback chain
    (a fallback DEFAULT satisfies the gate; FLAG does not)."""
    from ..operators.retrieval import missing_required

    gate = missing_required(quick_scan(_zone_texts(spark, sf), P03_FIELDS),
                            P03_FIELDS)
    return gate.select(
        "doc_id",
        F.concat_ws(",", "missing").alias("missing_csv"),
        (F.size("missing").cast("long")).alias("n_missing"),
        "passed",
    )


QUERIES["p04_required_gate"] = p04_required_gate

_REQUIRED = [f["name"] for f in P03_FIELDS if f.get("required")]
ORACLE["p04_required_gate"] = f"""
WITH scan AS ({{p03}}),
miss AS (
  SELECT doc_id,
         string_agg(field, ',' ORDER BY field) AS missing_csv,
         count(*) AS n_missing
  FROM scan
  WHERE field IN ({", ".join("'" + n + "'" for n in _REQUIRED)})
    AND value IS NULL
  GROUP BY doc_id
)
SELECT s.doc_id, coalesce(m.missing_csv, '') AS missing_csv,
       coalesce(m.n_missing, 0) AS n_missing,
       m.doc_id IS NULL AS passed
FROM (SELECT DISTINCT doc_id FROM scan) s
LEFT JOIN miss m USING (doc_id)
""".replace("{p03}", ORACLE["p03_quick_scan"])
