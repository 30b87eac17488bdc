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
# "tonnage" carries year-template aliases ({YYYY}/{YYYY-1}, docpact
# contracts.py:192-219) resolved against PIVOT_YEAR before matching.
RAW_SCHEMA = {
    "port": ["port name"],
    "vessel": ["ship"],
    "tonnage": ["tonnage (mt)", "total tonnage", "{YYYY} tonnage", "{YYYY-1} tonnage"],
    "eta": ["laycan"],
    "cargo": [],
    "grade": ["grade name"],
    "discharge_rate": ["discharge rate"],
}
PIVOT_YEAR = 1995

from ..operators.schema_map import resolve_year_templates  # noqa: E402

SCHEMA = resolve_year_templates(RAW_SCHEMA, PIVOT_YEAR)

# Header fixture: direct hits, casing/quoting/whitespace noise, ' / '
# compound forms (part match), a joined-form-only match, year-template
# hits ("1995 Tonnage" via {YYYY}, "1994 Tonnage" via {YYYY-1}), an
# unmatched.
HEADERS = [
    "Port",
    "VESSEL",
    "Tonnage  (MT)",
    '"Cargo"',
    "grade  name",
    "vessel / tonnage",
    "Laycan / ETA",
    "Discharge / Rate",
    "1995 Tonnage",
    "1994 Tonnage",
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


# ---------------------------------------------------------------- h02
_H02_ORACLE = f"""
WITH m AS ({_H01_ORACLE}),
cols(canonical) AS (VALUES {", ".join("('" + c + "')" for c in RAW_SCHEMA)})
SELECT c.canonical,
       coalesce(n.n, 0) AS n_headers,
       coalesce(n.n, 0) > 0 AS covered
FROM cols c
LEFT JOIN (SELECT canonical, CAST(count(*) AS BIGINT) AS n
           FROM m WHERE canonical IS NOT NULL GROUP BY 1) n
  ON n.canonical = c.canonical
"""


@q("h02_preflight_coverage", oracle=_H02_ORACLE)
def h02(spark, sf):
    """Preflight header-coverage report (docpact semantics.py:202-297):
    per canonical schema column, how many fixture headers resolved to it,
    zero-coverage columns included (the reference's informational
    pre-mapping warning). A tiny agg over h01's broadcast-join output."""
    from ..operators.schema_map import coverage_report

    headers = spark.createDataFrame([(h,) for h in HEADERS], "header string")
    mapped = map_headers(headers, alias_table(spark, SCHEMA))
    return coverage_report(mapped, SCHEMA)


# ---------------------------------------------------------------- h03
# Dimension-type schema columns (string dims can become title constants;
# measures never do — docpact DIMENSION_TYPES analogue).
DIM_COLS = {"port", "vessel", "cargo", "grade", "eta"}

# Title fixture: exact alias hit, normalization noise, substring hit,
# two-candidate ambiguity (skipped), measure-alias (excluded), no match.
TITLES = [
    "Port Name",
    "GRADE  NAME",
    "Ship",
    "Winter shipping of grade name and stems",
    "Vessel and cargo outlook",
    "Tonnage (MT)",
    "Freight market report",
]

_H03_ORACLE = f"""
WITH titles(title) AS (VALUES {_sql_values([(x,) for x in TITLES])}),
al(canonical, alias) AS (VALUES {_sql_values(_alias_rows())}),
aln AS (SELECT DISTINCT canonical, {_NORM_A} AS norm_alias FROM al
        WHERE canonical IN ({", ".join("'" + c + "'" for c in sorted(DIM_COLS))})),
tn AS (SELECT DISTINCT title, {NORM_SQL.format(x="title")} AS norm FROM titles),
exact AS (
  SELECT t.title, count(DISTINCT a.canonical) AS nc, min(a.canonical) AS c
  FROM tn t JOIN aln a ON t.norm = a.norm_alias GROUP BY 1
),
subs AS (
  SELECT t.title, count(DISTINCT a.canonical) AS nc, min(a.canonical) AS c
  FROM tn t JOIN aln a
    ON len(a.norm_alias) >= 3
   AND (' ' || t.norm || ' ') LIKE ('% ' || a.norm_alias || ' %')
  GROUP BY 1
)
SELECT t.title,
       CASE WHEN e.nc = 1 THEN e.c
            WHEN e.title IS NULL AND s.nc = 1 THEN s.c END AS canonical,
       CASE WHEN e.nc = 1 THEN 'title'
            WHEN e.title IS NULL AND s.nc = 1 THEN 'substring' END AS match_via
FROM titles t
LEFT JOIN exact e ON e.title = t.title
LEFT JOIN subs s ON s.title = t.title
"""


@q("h03_title_constant_dim", oracle=_H03_ORACLE)
def h03(spark, sf):
    """Title -> schema constant-dimension match (docpact
    interpret.py:1388-1424): exact alias match then unique word-boundary
    substring fallback, dimension-type columns only, ambiguity skipped.
    Both passes broadcast against the tiny alias dictionary."""
    from ..operators.schema_map import match_title_dims

    titles = spark.createDataFrame([(x,) for x in TITLES], "title string")
    return match_title_dims(titles, alias_table(spark, SCHEMA), DIM_COLS)


# ---------------------------------------------------------------- u01
_U01_ORACLE = """
WITH f AS (
  SELECT o_custkey, year(o_orderdate) AS yr, o_totalprice
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
),
py AS (
  SELECT o_custkey, yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
         count(*) AS n_orders
  FROM f GROUP BY 1, 2
),
keys AS (SELECT DISTINCT o_custkey FROM f),
sfx(yr, _pivot) AS (VALUES (1995, 'FY 1995'), (1996, 'FY 1996'))
SELECT k.o_custkey, s._pivot,
       coalesce(p.n_orders, 0) AS n_orders,
       coalesce(p.total, 0.0) AS total
FROM keys k CROSS JOIN sfx s
LEFT JOIN py p ON p.o_custkey = k.o_custkey AND p.yr = s.yr
"""


@q("u01_unpivot_compound_headers", oracle=_U01_ORACLE)
def u01(spark, sf):
    """Schema-agnostic compound-header unpivot (docpact unpivot.py:143-400
    semantics): a wide per-customer table whose headers carry fuzzy-variant
    suffixes ("FY 1995" vs "FY1995") is detected driver-side on the schema
    and unpivoted in ONE stack() projection (operators/unpivot.py)."""
    from ..operators.unpivot import detect_and_unpivot
    from .base import t

    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        "o_totalprice",
    ).filter(F.col("yr").isin(1995, 1996))

    def _total(y):
        return F.sum(
            F.when(F.col("yr") == y, F.col("o_totalprice")).cast(
                "decimal(18,4)"
            )
        ).cast("double")

    def _n(y):
        return F.sum(F.when(F.col("yr") == y, F.lit(1)).cast("long"))

    wide = o.groupBy("o_custkey").agg(
        _total(1995).alias("total / FY 1995"),
        _n(1995).alias("n_orders / FY1995"),
        _total(1996).alias("total / FY 1996"),
        _n(1996).alias("n_orders / FY1996"),
    )
    # null-free output contract (oracle comparator convention): a suffix
    # with no rows for the key reports 0 / 0.0 instead of null
    return detect_and_unpivot(wide).select(
        "o_custkey",
        "_pivot",
        F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )
