"""Schema-mapping query: the operators/schema_map.py broadcast-join
alias resolution applied to a fixed header fixture (inlined into BOTH
the Spark plan and the DuckDB oracle, like the LSH hyperplanes), with
the reference's three-pass semantics oracle-verified end-to-end."""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

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
    # fuzzy-only headers: misses every exact pass, lands in h04's
    # trigram matcher (typo of "tonnage (mt)" / "port name")
    "Tonage (MT)",
    "Port Nmae",
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


# ---------------------------------------------------------------- u02
# Deterministic dimension/measure mapping (interpret.py:1335-1618) over
# a Russian-ag-ministry-style wide layout: a shared label column, two
# crop/unit compound columns (crop = GROUP dim, Th.ha. = CONSTANT dim +
# float measure via the both-types alias rule), and two source/year
# columns ("2025" aliases BOTH the int `year` and the float `value` —
# the int+float rule makes year a constant dimension and value the
# measure). Cell data derives from the customer table so the record
# stream scales with SF while the header layout stays contract-sized.
H04_SCHEMA = {
    "region": ("string", []),
    "crop": ("string", ["spring crops", "spring grain"]),
    "unit": ("string", ["th.ha."]),
    "area": ("float", ["th.ha."]),
    "source": ("string", ["plan", "fact"]),
    "year": ("int", ["2025"]),
    "value": ("float", ["2025"]),
}
H04_HEADERS = [
    "Region",
    "Spring crops / Th.ha.",
    "Spring grain / Th.ha.",
    "Plan / 2025",
    "Fact / 2025",
]
H04_RECORD_COLS = ["region", "crop", "unit", "source", "year", "area", "value"]


def _h04_typed_alias_rows():
    out = []
    for canonical, (ty, aliases) in H04_SCHEMA.items():
        for a in {canonical, *aliases}:
            out.append((canonical, ty, a))
    return sorted(out)


_NORM_PART = NORM_SQL.format(x="string_split(header, ' / ')[u.pi]")

_U02_ORACLE = f"""
WITH cells AS (
  SELECT 'doc-' || CAST(c_custkey % 40 AS VARCHAR) AS doc_id,
         c_custkey AS row_id, u.ci - 1 AS col_idx,
         [c_name, CAST(c_nationkey AS VARCHAR),
          CAST(c_custkey % 100 AS VARCHAR),
          CAST((c_custkey * 7) % 1000 AS VARCHAR),
          c_mktsegment][u.ci] AS cell
  FROM customer, unnest(generate_series(1, 5)) AS u(ci)
),
hdr0(col_idx, header) AS (VALUES {", ".join(
    f"({i}, '" + h.replace("'", "''") + "')" for i, h in enumerate(H04_HEADERS)
)}),
hdrs AS (
  SELECT d.doc_id, h.col_idx, h.header
  FROM (SELECT DISTINCT doc_id FROM cells) d CROSS JOIN hdr0 h
),
al(canonical, type, alias) AS (VALUES {", ".join(
    "('" + c + "', '" + ty + "', '" + a.replace("'", "''") + "')"
    for c, ty, a in _h04_typed_alias_rows()
)}),
aln AS (SELECT DISTINCT canonical, type, {_NORM_A} AS norm_alias FROM al),
parts AS (
  SELECT doc_id, col_idx, u.pi - 1 AS pi,
         trim(string_split(header, ' / ')[u.pi]) AS part,
         {_NORM_PART} AS norm
  FROM hdrs,
       unnest(generate_series(1, len(string_split(header, ' / ')))) AS u(pi)
),
m AS (
  SELECT p.doc_id, p.col_idx, p.pi, p.part, a.canonical, a.type
  FROM parts p LEFT JOIN aln a ON p.norm = a.norm_alias
),
cls AS (
  SELECT doc_id, col_idx, pi, part, canonical, type,
         CASE WHEN type IN ('string', 'date') THEN 'dim'
              WHEN type = 'int' AND max(CASE WHEN type = 'float' THEN 1
                  ELSE 0 END) OVER (PARTITION BY doc_id, col_idx, pi) = 1
                THEN 'dim'
              WHEN type IS NOT NULL THEN 'measure' END AS role
  FROM m
),
per_col AS (
  SELECT doc_id, col_idx, max(pi) AS max_pi,
         sum(CASE WHEN canonical IS NOT NULL THEN 1 ELSE 0 END) AS n_match,
         sum(CASE WHEN role = 'measure' THEN 1 ELSE 0 END) AS n_meas,
         min(CASE WHEN role = 'dim' THEN canonical END) AS canonical
  FROM cls GROUP BY 1, 2
),
shared AS (
  SELECT doc_id, col_idx, canonical FROM per_col
  WHERE max_pi = 0 AND n_match >= 1 AND n_meas = 0
),
dims AS (
  SELECT doc_id, col_idx, canonical, part AS value
  FROM cls WHERE role = 'dim'
),
dv AS (
  SELECT doc_id, canonical, count(DISTINCT value) AS n_vals,
         count(*) AS n_entries, min(value) AS value
  FROM dims GROUP BY 1, 2
),
gnames AS (SELECT doc_id, canonical FROM dv WHERE n_vals >= 2),
cdims AS (
  SELECT doc_id, canonical, value FROM dv
  WHERE n_vals = 1 AND n_entries >= 2
),
ns AS (
  SELECT c.* FROM cls c
  WHERE NOT EXISTS (SELECT 1 FROM shared s
                    WHERE s.doc_id = c.doc_id AND s.col_idx = c.col_idx)
),
colg AS (
  SELECT DISTINCT n.doc_id, n.col_idx, n.canonical, n.part AS value
  FROM ns n JOIN gnames g
    ON g.doc_id = n.doc_id AND g.canonical = n.canonical
  WHERE n.role = 'dim'
),
gk AS (
  SELECT doc_id, col_idx,
         string_agg(canonical || '=' || value, '|'
                    ORDER BY canonical, value) AS group_key
  FROM colg GROUP BY 1, 2
),
meas AS (SELECT doc_id, col_idx, canonical FROM ns WHERE role = 'measure'),
member AS (
  SELECT doc_id, col_idx FROM gk
  UNION SELECT doc_id, col_idx FROM meas
),
keyed AS (
  SELECT mb.doc_id, mb.col_idx, coalesce(g.group_key, '') AS group_key
  FROM member mb LEFT JOIN gk g
    ON g.doc_id = mb.doc_id AND g.col_idx = mb.col_idx
),
grps AS (SELECT DISTINCT doc_id, group_key FROM keyed),
gmeas AS (
  SELECT k.doc_id, k.group_key, me.col_idx, me.canonical
  FROM meas me JOIN keyed k
    ON k.doc_id = me.doc_id AND k.col_idx = me.col_idx
),
gdims AS (
  SELECT DISTINCT k.doc_id, k.group_key, cg.canonical, cg.value
  FROM colg cg JOIN keyed k
    ON k.doc_id = cg.doc_id AND k.col_idx = cg.col_idx
  UNION
  SELECT g.doc_id, g.group_key, cd.canonical, cd.value
  FROM grps g JOIN cdims cd ON cd.doc_id = g.doc_id
),
rows_u AS (SELECT DISTINCT doc_id, row_id FROM cells),
spine AS (
  SELECT r.doc_id, r.row_id, g.group_key
  FROM rows_u r JOIN grps g ON g.doc_id = r.doc_id
),
allv AS (
  SELECT c.doc_id, c.row_id, gm.group_key, gm.canonical, c.cell AS value
  FROM cells c JOIN gmeas gm
    ON gm.doc_id = c.doc_id AND gm.col_idx = c.col_idx
  UNION ALL
  SELECT c.doc_id, c.row_id, g.group_key, s.canonical, c.cell
  FROM cells c
  JOIN shared s ON s.doc_id = c.doc_id AND s.col_idx = c.col_idx
  JOIN grps g ON g.doc_id = c.doc_id
  UNION ALL
  SELECT r.doc_id, r.row_id, d.group_key, d.canonical, d.value
  FROM gdims d JOIN rows_u r ON r.doc_id = d.doc_id
)
SELECT s.doc_id, s.row_id, s.group_key,
       {", ".join(
           "coalesce(max(CASE WHEN a.canonical = '" + c + "' THEN a.value "
           "END), '') AS " + c
           for c in H04_RECORD_COLS
       )}
FROM spine s
LEFT JOIN allv a ON a.doc_id = s.doc_id AND a.row_id = s.row_id
   AND a.group_key = s.group_key
GROUP BY 1, 2, 3
"""


@q("u02_deterministic_mapping", oracle=_U02_ORACLE)
def u02(spark, sf):
    """Deterministic dimension/measure mapping (docpact
    interpret.py:1335-1618 semantics) as pure relational operators
    (operators/det_map.py): ' / '-part classification against the
    broadcast typed alias dictionary (string/date -> dimension from
    header text, int/float -> measure from the cell, int+float
    shared-alias -> the int becomes a dimension), shared single-part
    dimension columns, per-doc GROUP dims (>= 2 distinct header values)
    vs CONSTANT dims (1 value, >= 2 columns), and one record per
    (data row x unpivot group). Header analysis runs at header grain;
    the cell stream shuffles exactly once (the record pivot)."""
    from ..operators.det_map import map_deterministic, typed_alias_table
    from .base import t

    c = t(spark, sf, "customer")
    arr = F.array(
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
        (F.col("c_custkey") % 100).cast("string"),
        ((F.col("c_custkey") * 7) % 1000).cast("string"),
        F.col("c_mktsegment"),
    )
    cells = c.select(
        F.concat(
            F.lit("doc-"), (F.col("c_custkey") % 40).cast("string")
        ).alias("doc_id"),
        F.col("c_custkey").alias("row_id"),
        F.posexplode(arr).alias("col_idx", "cell"),
    )
    # the layout catalog is a literal relation (doc residues 0..39 x 5
    # headers) — deriving it from cells.distinct() would re-scan the
    # parquet + shuffle once per header-grain role branch
    headers = spark.createDataFrame(
        [(f"doc-{d}", i, h) for d in range(40) for i, h in enumerate(H04_HEADERS)],
        "doc_id string, col_idx int, header string",
    )
    rec = map_deterministic(
        cells, headers, typed_alias_table(spark, H04_SCHEMA), H04_RECORD_COLS
    )
    return rec.select(
        "doc_id",
        "row_id",
        "group_key",
        *[F.coalesce(c_, F.lit("")).alias(c_) for c_ in H04_RECORD_COLS],
    )


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


# ---------------------------------------------------------------- h04
# Trigram-Jaccard fuzzy matching over the headers the three exact
# passes (h01) could not resolve — the deterministic Spark-native
# analogue of the reference's semantic alias enrichment (docpact
# enriches aliases with an LLM; set-similarity fuzzy matching is the
# classic record-linkage fallback, OpenRefine/dedupe-style).  Exact
# integer milli Jaccard over distinct character trigrams of the
# NORMALIZED forms — shared normalization, so "Tonage (MT)" lands on
# "tonnage (mt)" while "Completely Unknown" is rejected.
_H04_ACCEPT_MILLI = 300


def _tri_spark(x: str) -> str:
    return (
        f"array_distinct(transform(sequence(1,"
        f" greatest(length({x}) - 2, 1)), i -> substring({x}, i, 3)))"
    )


def _tri_sql(x: str) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1,"
        f" greatest(length({x}) - 2, 1)), i -> substr({x}, i, 3)))"
    )


_H04_ORACLE = f"""
WITH base AS (
{_H01_ORACLE}
),
un(header) AS (SELECT header FROM base WHERE canonical IS NULL),
al(canonical, alias) AS (VALUES {{alias_rows}}),
scored AS (
  SELECT u.header, al.canonical, al.alias,
         CAST(1000 * len(list_intersect(
                {_tri_sql(_NORM_H)}, {_tri_sql(_NORM_A)}))
              // len(list_distinct(list_concat(
                {_tri_sql(_NORM_H)}, {_tri_sql(_NORM_A)})))
              AS INTEGER) AS jac_milli
  FROM un u, al
)
SELECT header, canonical, alias, jac_milli,
       jac_milli >= {_H04_ACCEPT_MILLI} AS accepted
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY header
                            ORDER BY jac_milli DESC, canonical, alias)
           AS rk
  FROM scored)
WHERE rk = 1
"""


@q(
    "h04_fuzzy_schema_match",
    oracle=_H04_ORACLE.replace("{alias_rows}", _sql_values(_alias_rows())),
)
def h04(spark, sf):
    """Trigram-Jaccard fuzzy schema matching for the headers every
    exact pass missed: best alias by integer milli Jaccard over
    normalized character trigrams, accepted at >= 0.3.

    Scale shape: the fuzzy pass runs ONLY on h01's unmatched residue
    (a thin stream even at 10^12 headers) crossed with the broadcast
    alias table — bounded work per unmatched header, no shuffle of
    the header stream; the argmax is one window over
    (few aliases) x (residue) rows.  A real semantic encoder swaps
    into the score column as an Arrow-batched pandas UDF with the
    identical join/argmax plan."""
    from pyspark.sql import Window as W

    un = (
        QUERIES["h01_header_schema_map"](spark, sf)
        .filter(F.col("canonical").isNull())
        .select("header")
    )
    al = F.broadcast(
        (SparkSession.getActiveSession() or un.sparkSession)
        .createDataFrame(
            _alias_rows(), "canonical string, alias string"
        )
    )
    from ..operators.schema_map import norm_header

    inter = "size(array_intersect(" + _tri_spark("nh") + \
        ", " + _tri_spark("na") + "))"
    union = (
        "size(array_distinct(concat(" + _tri_spark("nh")
        + ", " + _tri_spark("na") + ")))"
    )
    scored = (
        un.crossJoin(al)
        .withColumn("nh", norm_header(F.col("header")))
        .withColumn("na", norm_header(F.col("alias")))
        .select(
            "header",
            "canonical",
            "alias",
            F.expr(f"CAST(1000 * {inter} div {union} AS INT)").alias(
                "jac_milli"
            ),
        )
    )
    w = W.partitionBy("header").orderBy(
        F.col("jac_milli").desc(), "canonical", "alias"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "header",
            "canonical",
            "alias",
            "jac_milli",
            (F.col("jac_milli") >= _H04_ACCEPT_MILLI).alias("accepted"),
        )
    )
