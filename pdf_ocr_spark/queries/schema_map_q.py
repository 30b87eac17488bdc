"""Schema-mapping query: the operators/schema_map.py broadcast-join
alias resolution applied to a fixed header fixture (inlined into BOTH
the Spark plan and the DuckDB oracle, like the LSH hyperplanes), with
the reference's three-pass semantics oracle-verified end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.schema_map import NORM_SQL, alias_table, map_headers

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


# Contract schema (canonical -> aliases), mirroring the reference's
# contract JSON shape (docpact contracts/au_shipping_stem.json style).
SCHEMA = {
    "port": ["port name"],
    "vessel": ["ship"],
    "tonnage": ["tonnage (mt)", "total tonnage"],
    "eta": ["laycan"],
    "cargo": [],
    "grade": ["grade name"],
    "discharge_rate": ["discharge rate"],
}

# Header fixture: direct hits, casing/quoting/whitespace noise, ' / '
# compound forms (part match), a joined-form-only match, an unmatched.
HEADERS = [
    "Port",
    "VESSEL",
    "Tonnage  (MT)",
    '"Cargo"',
    "grade  name",
    "vessel / tonnage",
    "Laycan / ETA",
    "Discharge / Rate",
    "Completely Unknown",
]


def _sql_values(rows):
    return ", ".join(
        "(" + ", ".join("'" + v.replace("'", "''") + "'" for v in r) + ")"
        for r in rows
    )


def _alias_rows():
    out = []
    for canonical, aliases in SCHEMA.items():
        for a in {canonical, *aliases}:
            out.append((canonical, a))
    return sorted(out)


_NORM_H = NORM_SQL.format(x="header")
_NORM_A = NORM_SQL.format(x="alias")

_H01_ORACLE = f"""
WITH hdrs(header) AS (VALUES {_sql_values([(h,) for h in HEADERS])}),
al(canonical, alias) AS (VALUES {_sql_values(_alias_rows())}),
aln AS (SELECT DISTINCT canonical, {_NORM_A} AS norm_alias FROM al),
h AS (SELECT DISTINCT header, {_NORM_H} AS norm FROM hdrs),
direct AS (
  SELECT h.header, h.norm, aln.canonical AS c1
  FROM h LEFT JOIN aln ON h.norm = aln.norm_alias
),
un1 AS (SELECT header, norm FROM direct WHERE c1 IS NULL),
parts AS (
  SELECT header, u.pi - 1 AS pi,
         string_split(norm, ' / ')[u.pi] AS part
  FROM un1,
       unnest(generate_series(1, len(string_split(norm, ' / ')))) AS u(pi)
),
part_hit AS (
  SELECT p.header, min_by(aln.canonical, p.pi) AS c2
  FROM parts p JOIN aln ON p.part = aln.norm_alias
  GROUP BY p.header
),
un2 AS (
  SELECT header, norm FROM un1
  WHERE header NOT IN (SELECT header FROM part_hit)
),
joined_hit AS (
  SELECT u.header, aln.canonical AS c3
  FROM (SELECT header, regexp_replace(norm, ' / ', ' ', 'g') AS jn
        FROM un2) u
  JOIN aln ON u.jn = aln.norm_alias
)
SELECT d.header,
       coalesce(d.c1, p.c2, j.c3) AS canonical,
       CASE WHEN d.c1 IS NOT NULL THEN 'direct'
            WHEN p.c2 IS NOT NULL THEN 'part'
            WHEN j.c3 IS NOT NULL THEN 'joined'
       END AS match_via
FROM direct d
LEFT JOIN part_hit p ON p.header = d.header
LEFT JOIN joined_hit j ON j.header = d.header
"""


@q("h01_header_schema_map", oracle=_H01_ORACLE)
def h01(spark, sf):
    """Alias resolution as broadcast joins: direct norm match, ' / '
    part-wise match (first matching part wins), space-joined fallback
    (docpact interpret.py:1278-1331 semantics)."""
    headers = spark.createDataFrame(
        [(h,) for h in HEADERS], "header string"
    )
    return map_headers(headers, alias_table(spark, SCHEMA))
