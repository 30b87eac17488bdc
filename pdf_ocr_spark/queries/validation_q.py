"""Contract-validation queries over the ``documents`` table: the
operators/validation.py compiler applied with a concrete contract, plus
the corpus-level violation histogram. Both have DuckDB oracle twins (the
compiled rules are plain scalar SQL)."""

from __future__ import annotations

from ..operators.validation import validate, violation_histogram
from .base import t

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


# The documents-table contract (same vocabulary as the reference's JSON
# contracts: closed value sets, regex patterns, numeric ranges, required
# fields).
DOC_CONTRACT = {
    "lang": {"valid_values": ["en", "de", "fr", "es"], "not_null": True},
    "source": {"pattern": r"src\d+", "not_null": True},
    "n_chars": {"min": 50, "max": 400},
    "text": {"not_null": True},
}

_SQL_CHECKS = """
  (lang IN ('en','de','fr','es') OR lang IS NULL)            AS ok_lang_valid_values,
  (lang IS NOT NULL AND length(lang) > 0)                    AS ok_lang_not_null,
  (regexp_full_match(source, 'src[0-9]+') OR source IS NULL) AS ok_source_pattern,
  (source IS NOT NULL AND length(source) > 0)                AS ok_source_not_null,
  (CAST(n_chars AS DOUBLE) >= 50 OR n_chars IS NULL)         AS ok_n_chars_min,
  (CAST(n_chars AS DOUBLE) <= 400 OR n_chars IS NULL)        AS ok_n_chars_max,
  (text IS NOT NULL AND length(text) > 0)                    AS ok_text_not_null
"""

_SQL_VIOL = """
  list_sort(
    [v FOR v IN [
       CASE WHEN NOT ok_lang_valid_values THEN 'lang.valid_values' END,
       CASE WHEN NOT ok_lang_not_null     THEN 'lang.not_null' END,
       CASE WHEN NOT ok_source_pattern    THEN 'source.pattern' END,
       CASE WHEN NOT ok_source_not_null   THEN 'source.not_null' END,
       CASE WHEN NOT ok_n_chars_min       THEN 'n_chars.min' END,
       CASE WHEN NOT ok_n_chars_max       THEN 'n_chars.max' END,
       CASE WHEN NOT ok_text_not_null     THEN 'text.not_null' END
     ] IF v IS NOT NULL]) AS violations
"""


@q(
    "v01_contract_validation",
    oracle=f"""
WITH checked AS (SELECT doc_id, {_SQL_CHECKS} FROM documents),
tagged AS (SELECT doc_id, {_SQL_VIOL},
                  ok_lang_valid_values, ok_lang_not_null, ok_source_pattern,
                  ok_source_not_null, ok_n_chars_min, ok_n_chars_max,
                  ok_text_not_null
           FROM checked)
SELECT doc_id, ok_lang_valid_values, ok_lang_not_null, ok_source_pattern,
       ok_source_not_null, ok_n_chars_min, ok_n_chars_max, ok_text_not_null,
       coalesce(array_to_string(violations, ','), '') AS violations_csv,
       len(violations) AS n_violations,
       len(violations) = 0 AS valid
FROM tagged
""",
)
def v01(spark, sf):
    """Contract validation as assert columns (north_star: DataFrame
    filter/assert columns instead of SHACL metadata).  The violations
    array is surfaced as a CSV string: array-valued result columns
    round-trip differently through comparator toolchains (numpy repr vs
    list repr), so hash-compared outputs stay scalar."""
    from pyspark.sql import functions as F

    out = validate(t(spark, sf, "documents"), DOC_CONTRACT).drop(
        "text", "lang", "source", "n_chars"
    )
    return out.withColumn(
        "violations_csv", F.array_join("violations", ",")
    ).drop("violations")


@q(
    "v02_violation_histogram",
    oracle=f"""
WITH checked AS (SELECT doc_id, {_SQL_CHECKS} FROM documents),
tagged AS (SELECT doc_id, {_SQL_VIOL} FROM checked)
SELECT u.v AS violation, count(*) AS n_docs
FROM tagged, unnest(violations) AS u(v)
GROUP BY 1
""",
)
def v02(spark, sf):
    """Corpus-level validation metrics: violation tag -> document count
    (the reference's validation report as one explode+groupBy)."""
    return violation_histogram(
        validate(t(spark, sf, "documents"), DOC_CONTRACT)
    )


# ---------------------------------------------------------------- r01
_R01_ORACLE = """
WITH f AS (
  SELECT o_orderkey,
         CASE o_orderkey % 4
           WHEN 0 THEN 'inbox/report_' || strftime(o_orderdate, '%Y-%m-%d') || '_v2.pdf'
           WHEN 1 THEN 'inbox/stem ' || strftime(o_orderdate, '%d.%m.%Y') || '.pdf'
           WHEN 2 THEN 'inbox/' || strftime(o_orderdate, '%Y%m%d') || '_final.pdf'
           ELSE 'inbox/undated_report.pdf'
         END AS path
  FROM orders
),
x AS (
  SELECT o_orderkey, path,
         regexp_extract(path, '.*/(.*)$', 1) AS name
  FROM f
)
SELECT o_orderkey,
       strftime(coalesce(y.rd, DATE '1900-01-01'), '%Y-%m-%d') AS report_date,
       y.rd IS NOT NULL AS resolved
FROM (
  SELECT o_orderkey,
         coalesce(
           try_strptime(regexp_extract(name, '\\d{4}-\\d{2}-\\d{2}'), '%Y-%m-%d'),
           try_strptime(regexp_extract(name, '\\d{2}\\.\\d{2}\\.\\d{4}'), '%d.%m.%Y'),
           try_strptime(regexp_extract(name, '(?:\\D|^)(\\d{8})(?:\\D|$)', 1), '%Y%m%d')
         )::DATE AS rd
  FROM x
) y
"""


_R02_ORACLE = """
WITH f AS (
  SELECT o_orderkey,
         CASE o_orderkey % 4
           WHEN 0 THEN 'Quarterly Report — As of ' || strftime(o_orderdate, '%B %-d, %Y')
           WHEN 1 THEN 'For the year ended ' || strftime(o_orderdate, '%B %-d, %Y') || ' (audited)'
           WHEN 2 THEN 'Shipping stem ' || strftime(o_orderdate, '%Y-%m-%d') || ' weekly'
           ELSE 'Company overview and notes'
         END AS title_zone
  FROM orders
)
SELECT o_orderkey,
       strftime(coalesce(
         try_strptime(regexp_extract(title_zone, '[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})', 1), '%B %d, %Y'),
         try_strptime(regexp_extract(title_zone, '[Ff]or the (?:year|period|quarter) ended? ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})', 1), '%B %d, %Y'),
         try_strptime(regexp_extract(title_zone, '(\\d{4}-\\d{2}-\\d{2})', 1), '%Y-%m-%d'),
         try_strptime(regexp_extract(title_zone, '(\\d{1,2} [A-Za-z]+ \\d{4})', 1), '%d %B %Y'),
         TIMESTAMP '1900-01-01'), '%Y-%m-%d') AS report_date,
       coalesce(
         try_strptime(regexp_extract(title_zone, '[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})', 1), '%B %d, %Y'),
         try_strptime(regexp_extract(title_zone, '[Ff]or the (?:year|period|quarter) ended? ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})', 1), '%B %d, %Y'),
         try_strptime(regexp_extract(title_zone, '(\\d{4}-\\d{2}-\\d{2})', 1), '%Y-%m-%d'),
         try_strptime(regexp_extract(title_zone, '(\\d{1,2} [A-Za-z]+ \\d{4})', 1), '%d %B %Y')
       ) IS NOT NULL AS resolved
FROM f
"""


@q("r02_report_date_content", oracle=_R02_ORACLE)
def r02(spark, sf):
    """Report-date resolution from the document's TITLE ZONE text (docpact
    report_date.py:62-81 "content" source, deterministic): the RH1
    temporal regexes (heuristics.py:442-506) extract the date phrase from
    a synthesized title-zone line, multi-format coalesce parses it. Pure
    scalar projection (folds into the scan); unresolved docs surface the
    1900-01-01 sentinel + resolved=false (null-free output contract)."""
    from pyspark.sql import functions as F

    from ..operators.report_date import report_date_from_content

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.concat(
                F.lit("Quarterly Report — As of "),
                F.date_format("o_orderdate", "MMMM d, yyyy"),
            ),
        )
        .when(
            F.col("o_orderkey") % 4 == 1,
            F.concat(
                F.lit("For the year ended "),
                F.date_format("o_orderdate", "MMMM d, yyyy"),
                F.lit(" (audited)"),
            ),
        )
        .when(
            F.col("o_orderkey") % 4 == 2,
            F.concat(
                F.lit("Shipping stem "),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit(" weekly"),
            ),
        )
        .otherwise(F.lit("Company overview and notes"))
        .alias("title_zone"),
    )
    rd = report_date_from_content(F.col("title_zone"))
    return o.select(
        "o_orderkey",
        F.date_format(
            F.coalesce(rd, F.to_date(F.lit("1900-01-01"))), "yyyy-MM-dd"
        ).alias("report_date"),
        rd.isNotNull().alias("resolved"),
    )


@q("r01_report_date_filename", oracle=_R01_ORACLE)
def r01(spark, sf):
    """Report-date resolution from file names (docpact report_date.py:29-81
    "filename" source, made deterministic): regex date-token candidates +
    multi-format coalesce parse (operators/report_date.py). Pure scalar
    projection — folds into the scan at any scale."""
    from pyspark.sql import functions as F

    from ..operators.report_date import report_date_from_filename

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.concat(
                F.lit("inbox/report_"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit("_v2.pdf"),
            ),
        )
        .when(
            F.col("o_orderkey") % 4 == 1,
            F.concat(
                F.lit("inbox/stem "),
                F.date_format("o_orderdate", "dd.MM.yyyy"),
                F.lit(".pdf"),
            ),
        )
        .when(
            F.col("o_orderkey") % 4 == 2,
            F.concat(
                F.lit("inbox/"),
                F.date_format("o_orderdate", "yyyyMMdd"),
                F.lit("_final.pdf"),
            ),
        )
        .otherwise(F.lit("inbox/undated_report.pdf"))
        .alias("path"),
    )
    rd = report_date_from_filename(F.col("path"))
    # null-free output contract: unresolved dates surface as a sentinel
    # plus resolved=false (operator keeps null semantics)
    return o.select(
        "o_orderkey",
        F.date_format(F.coalesce(rd, F.to_date(F.lit("1900-01-01"))), "yyyy-MM-dd").alias("report_date"),
        rd.isNotNull().alias("resolved"),
    )


# ---------------------------------------------------------------- v04
# Deequ-style column profiler — the data-quality gate a production
# pipeline runs before accepting a new corpus drop: per column, row
# count, null count, exact distinct count, integer-ppm completeness,
# and string-cast min/max.  The corpus ships null-free, so 'source' is
# profiled through NULLIF(source, 'src1') — the t10/t22 documented
# synthetic-injection pattern — to exercise the null/completeness
# arithmetic on every run.
_V04_COLS = ("lang", "source", "text", "n_chars")

_V04_SQL_ARM = """
SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST((count({c}) * 1000000) // count(*) AS BIGINT)
         AS completeness_ppm,
       COALESCE(CAST(min({c}) AS VARCHAR), '') AS min_s,
       COALESCE(CAST(max({c}) AS VARCHAR), '') AS max_s
FROM src
"""

_V04_ORACLE = (
    "WITH src AS (SELECT lang, NULLIF(source, 'src1') AS source, text,"
    " n_chars FROM documents)\n"
    + "\nUNION ALL\n".join(_V04_SQL_ARM.format(c=c) for c in _V04_COLS)
)


@q("v04_data_profile", oracle=_V04_ORACLE)
def v04(spark, sf):
    """Column-profile report over the documents table (one row per
    profiled column).

    Scale shape: ONE aggregate pass over one scan — all per-column
    metrics (null counts, exact distincts, min/max) computed in a
    single wide agg row, then stacked to long form JVM-side (the
    DuckDB twin runs the naive one-arm-per-column UNION, 4 scans, so
    the engines cross-check different strategies).  Exact
    count_distinct on several columns expands the aggregate
    (Spark's Expand operator multiplies rows by #distinct-aggs);
    at 100 TB swap exact distincts for approx_count_distinct per
    column or profile columns in batches.  Completeness freezes to
    integer ppm."""
    from pyspark.sql import functions as F

    d = t(spark, sf, "documents").select(
        "lang",
        F.nullif("source", F.lit("src1")).alias("source"),
        "text",
        "n_chars",
    )
    aggs = [F.count("*").alias("n_rows")]
    for c in _V04_COLS:
        aggs += [
            F.count(c).alias(f"{c}_nn"),
            F.count_distinct(F.col(c)).alias(f"{c}_nd"),
            # min/max in the column's native type, cast AFTER (the
            # oracle casts the numeric min of n_chars, not the min of
            # the cast strings — '99' > '100' lexicographically);
            # coalesce to '' so an all-null column profiles to empty
            # strings identically in both engines (NULL would also
            # break the suite's NULL-propagating || key in DuckDB vs
            # Spark's NULL-skipping concat_ws)
            F.coalesce(F.min(F.col(c)).cast("string"), F.lit("")).alias(
                f"{c}_min"
            ),
            F.coalesce(F.max(F.col(c)).cast("string"), F.lit("")).alias(
                f"{c}_max"
            ),
        ]
    wide = d.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}_nn, {c}_nd, {c}_min, {c}_max" for c in _V04_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_V04_COLS)}, {stack})"
            " AS (col_name, nn, n_distinct, min_s, max_s)"
        ),
        "n_rows",
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("nn")).alias("n_null"),
        "n_distinct",
        F.expr("CAST(nn * 1000000 div n_rows AS BIGINT)").alias(
            "completeness_ppm"
        ),
        "min_s",
        "max_s",
    )


# ---------------------------------------------------------------- v05
# Snapshot drift detection — the validation gate between two runs of a
# recurring pipeline (Evidently/Deequ-style): Population Stability
# Index per monitored column between a baseline window (days 1-15 of
# the event month) and the current window (days 16+).  Monitored
# dimensions: the event-type mix, the fixed-width value histogram
# (width 50, capped at bin 9), hour-of-day, and day-of-week.
#
# Float discipline: bin proportions are Laplace-smoothed exact ratios
# of BIGINT counts ((n+1)/(N+k)); each bin's PSI contribution
# (p-q)*ln(p/q) is non-negative, frozen to integer micro units per bin
# (t14's micro-nat discipline), and SUMMED AS INTEGERS — so the
# per-column PSI is associative and engine-identical.  Drift flag at
# the classic 0.2 threshold (200 000 micro).
_V05_THRESH = 200000


def _v05_monitored_sql() -> list[tuple[str, str, str]]:
    """(col_name, spark bin expr, duckdb bin expr) per monitored dim."""
    return [
        ("event_type", "event_type", "event_type"),
        (
            "value_bin",
            "CAST(CAST(least(9, floor(value / 50)) AS INT) AS STRING)",
            "CAST(CAST(least(9, floor(value / 50)) AS INTEGER) AS VARCHAR)",
        ),
        (
            "hour",
            "CAST(hour(ts) AS STRING)",
            "CAST(date_part('hour', ts) AS VARCHAR)",
        ),
        (
            "dow",
            "CAST(dayofweek(ts) - 1 AS STRING)",
            "CAST(date_part('dow', ts) AS VARCHAR)",
        ),
    ]


_V05_PSI_NUM = (
    "(({b} + 1) / CAST(n_base + k AS DOUBLE)"
    " - ({c} + 1) / CAST(n_curr + k AS DOUBLE))"
    " * ln((({b} + 1) / CAST(n_base + k AS DOUBLE))"
    " / (({c} + 1) / CAST(n_curr + k AS DOUBLE))) * 1000000"
)

_V05_ORACLE = f"""
WITH e AS (
  SELECT CASE WHEN date_part('day', ts) <= 15 THEN 0 ELSE 1 END AS cur,
         {", ".join(f"{d} AS {n}" for n, _, d in _v05_monitored_sql())}
  FROM events
),
m AS (
  {" UNION ALL ".join(
      f"SELECT '{n}' AS col_name, {n} AS bin, cur FROM e"
      for n, _, _ in _v05_monitored_sql()
  )}
),
c AS (
  SELECT col_name, bin,
         CAST(count(*) FILTER (cur = 0) AS BIGINT) AS nb,
         CAST(count(*) FILTER (cur = 1) AS BIGINT) AS nc
  FROM m GROUP BY col_name, bin
),
tot AS (
  SELECT col_name, nb, nc,
         sum(nb) OVER (PARTITION BY col_name) AS n_base,
         sum(nc) OVER (PARTITION BY col_name) AS n_curr,
         count(*) OVER (PARTITION BY col_name) AS k
  FROM c
),
contrib AS (
  SELECT col_name, n_base, n_curr, k,
         CAST(round({_V05_PSI_NUM.format(b="nb", c="nc")}) AS BIGINT)
           AS cm
  FROM tot
)
SELECT col_name, CAST(max(k) AS BIGINT) AS n_bins,
       CAST(max(n_base) AS BIGINT) AS n_base,
       CAST(max(n_curr) AS BIGINT) AS n_curr,
       CAST(sum(cm) AS BIGINT) AS psi_micro,
       (sum(cm) > {_V05_THRESH}) AS drifted
FROM contrib GROUP BY col_name
"""


@q("v05_drift_psi", oracle=_V05_ORACLE)
def v05(spark, sf):
    """PSI drift report between the baseline (days 1-15) and current
    (days 16+) event windows: one row per monitored column with the
    smoothed-integer PSI and the 0.2-threshold drift verdict.

    Scale shape: the monitored dimensions explode from ONE scan into a
    4-struct array (scan-local), then a single (col, bin) shuffle with
    map-side partial counts; everything after runs on the bin relation
    (|monitored dims| x |bins| rows — ~46 here, bounded at any corpus
    size), so at 100 TB the job costs one pass + one tiny shuffle.
    Per-bin contributions freeze to integer micro units before the
    per-column sum, keeping the report bit-identical under any
    partitioning."""
    from pyspark.sql import Window as W, functions as F

    e = t(spark, sf, "events")
    mon = F.array(
        *[
            F.struct(
                F.lit(n).alias("col_name"),
                F.expr(s).alias("bin"),
            )
            for n, s, _ in _v05_monitored_sql()
        ]
    )
    rows = e.select(
        (F.dayofmonth("ts") > 15).cast("int").alias("cur"),
        F.explode(mon).alias("m"),
    )
    c = rows.groupBy(
        F.col("m.col_name").alias("col_name"), F.col("m.bin").alias("bin")
    ).agg(
        F.sum(1 - F.col("cur")).alias("nb"),
        F.sum("cur").alias("nc"),
    )
    wc = W.partitionBy("col_name")
    tot = c.select(
        "col_name",
        "nb",
        "nc",
        F.sum("nb").over(wc).alias("n_base"),
        F.sum("nc").over(wc).alias("n_curr"),
        F.count("*").over(wc).alias("k"),
    )
    contrib = tot.select(
        "col_name",
        "n_base",
        "n_curr",
        "k",
        F.round(F.expr(_V05_PSI_NUM.format(b="nb", c="nc")))
        .cast("long")
        .alias("cm"),
    )
    return contrib.groupBy("col_name").agg(
        F.max("k").cast("long").alias("n_bins"),
        F.max("n_base").cast("long").alias("n_base"),
        F.max("n_curr").cast("long").alias("n_curr"),
        F.sum("cm").alias("psi_micro"),
        (F.sum("cm") > _V05_THRESH).alias("drifted"),
    )


# ------------------------------------------------------------- v06
# Referential-integrity audit — the Deequ/Great-Expectations FK
# constraint family: for every foreign-key edge in the star schema,
# count child rows whose key has no parent (orphans) and report a
# per-edge pass verdict.  The synthetic TPC-H-ish tables are
# referentially intact, so a DAMAGED edge is audited alongside the
# real ones (the t10/t27 deterministic-injection pattern: parents with
# key % 97 == 0 are treated as deleted), exercising the orphan branch
# on every run.
_V06_EDGES = (
    # (edge name, child table, child key, parent table, parent key)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)
_V06_DAMAGED = (
    "orders->customer~damaged", "orders", "o_custkey", "customer",
    "c_custkey",
)


def _v06_oracle() -> str:
    arms = []
    for name, child, ck, parent, pk in _V06_EDGES + (_V06_DAMAGED,):
        dmg = name.endswith("~damaged")
        pfilter = f"WHERE {pk} % 97 <> 0" if dmg else ""
        arms.append(f"""
SELECT '{name}' AS edge,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM {child} c
LEFT JOIN (SELECT {pk} FROM {parent} {pfilter}) p ON c.{ck} = p.{pk}
""")
    u = "UNION ALL".join(arms)
    return f"""
SELECT edge, n_rows, n_orphans,
       (n_orphans * 1000000) // n_rows AS orphan_rate_micro,
       (n_orphans = 0) AS ok
FROM ({u})
"""


@q("v06_fk_audit", oracle=_v06_oracle())
def v06(spark, sf):
    """Referential-integrity audit over every FK edge of the star
    schema: per edge the child row count, orphan count, integer-micro
    orphan rate, and a pass verdict; one edge is deterministically
    damaged (parents with key % 97 == 0 dropped) so the orphan branch
    is live on every run.

    Scale shape: each edge is ONE left join + ONE map-side-combined
    count aggregation.  True dims (region/nation/customer/part/
    supplier at their TPC-H ratios) broadcast; the lineitem->orders
    edge is the only genuinely fact-to-fact check and shuffles on the
    join key exactly once — on a bucketed lakehouse table even that
    exchange disappears.  The orphan count rides the join as a
    null-parent sum, so no second pass over the child."""
    from pyspark.sql import functions as F

    outs = []
    for name, child, ck, parent, pk in _V06_EDGES + (_V06_DAMAGED,):
        c = t(spark, sf, child).select(F.col(ck).alias("k"))
        p = t(spark, sf, parent).select(F.col(pk).alias("pk_"))
        if name.endswith("~damaged"):
            p = p.filter(F.col("pk_") % 97 != 0)
        j = c.join(p, c.k == p.pk_, "left")
        outs.append(
            j.agg(
                F.lit(name).alias("edge"),
                F.count("*").alias("n_rows"),
                F.sum(
                    F.when(F.col("pk_").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "edge",
        "n_rows",
        "n_orphans",
        F.expr("(n_orphans * 1000000L) div n_rows").alias(
            "orphan_rate_micro"
        ),
        (F.col("n_orphans") == 0).alias("ok"),
    )


# ------------------------------------------------------------- v07
# CDC snapshot diff — the lakehouse changelog operator (Delta CDF /
# Iceberg changelog semantics, public): given two snapshots of a keyed
# table, emit one row per changed key with the op (I/D/U) and the
# exact set of changed columns.  The two snapshots are derived
# deterministically from ``orders`` (the t10/t27/v06 injection
# pattern): keys % 101 == 0 are missing from OLD (later inserts),
# keys % 103 == 0 are missing from NEW (deletes), and NEW mutates
# o_orderpriority on keys % 7 == 0 and o_orderstatus on keys % 11 == 0
# (string mutations -- no float arithmetic anywhere near the hash).
_V07_OLD_MOD, _V07_NEW_MOD = 101, 103

_V07_ORACLE = f"""
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % {_V07_OLD_MOD} <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN '9-SYNTH'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % {_V07_NEW_MOD} <> 0
),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NULL AS ins, n.o_orderkey IS NULL AS del,
         o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
         o.o_orderpriority AS old_priority,
         n.o_orderpriority AS new_priority
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN ins THEN 'I' WHEN del THEN 'D' ELSE 'U' END AS op,
       CASE WHEN ins OR del THEN '' ELSE concat_ws(',',
         CASE WHEN old_status IS DISTINCT FROM new_status
              THEN 'o_orderstatus' END,
         CASE WHEN old_priority IS DISTINCT FROM new_priority
              THEN 'o_orderpriority' END) END AS changed_cols,
       old_status, new_status, old_priority, new_priority
FROM j
WHERE ins OR del
   OR old_status IS DISTINCT FROM new_status
   OR old_priority IS DISTINCT FROM new_priority
"""


@q("v07_snapshot_diff", oracle=_V07_ORACLE)
def v07(spark, sf):
    """CDC snapshot diff between two deterministic snapshots of the
    orders table: changelog-grain output — one row per inserted (I),
    deleted (D), or updated (U) key, updates carrying the exact CSV of
    changed columns plus old/new values of the mutated columns.

    Scale shape: ONE full-outer sort-merge join on the primary key —
    the canonical snapshot-diff plan; on bucketed/partitioned
    lakehouse tables both exchanges disappear and the diff is a
    zipper-merge per bucket.  Change detection rides the join as
    null-safe column comparisons (no second pass), and the output is
    changelog-grain — sink volume is proportional to churn, not to
    table size, which is what makes the operator viable on a 100 TB
    dimension snapshot with 0.1% daily drift."""
    from pyspark.sql import functions as F

    base = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    old = base.where(F.col("o_orderkey") % _V07_OLD_MOD != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("old_status"),
        F.col("o_orderpriority").alias("old_priority"),
    )
    new = (
        base.where(F.col("o_orderkey") % _V07_NEW_MOD != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("new_status"),
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("9-SYNTH"))
            .otherwise(F.col("o_orderpriority"))
            .alias("new_priority"),
        )
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    ins = F.col("o.k").isNull()
    dele = F.col("n.k").isNull()
    st_chg = ~F.col("old_status").eqNullSafe(F.col("new_status"))
    pr_chg = ~F.col("old_priority").eqNullSafe(F.col("new_priority"))
    return (
        j.where(ins | dele | st_chg | pr_chg)
        .select(
            F.coalesce("o.k", "n.k").alias("o_orderkey"),
            F.when(ins, "I").when(dele, "D").otherwise("U").alias("op"),
            F.when(ins | dele, "")
            .otherwise(
                F.concat_ws(
                    ",",
                    F.when(st_chg, "o_orderstatus"),
                    F.when(pr_chg, "o_orderpriority"),
                )
            )
            .alias("changed_cols"),
            "old_status",
            "new_status",
            "old_priority",
            "new_priority",
        )
    )


# ------------------------------------------------------------- v08
# CDC merge-apply — the other half of v07: apply the changelog to the
# OLD snapshot with MERGE semantics (delete D keys, upsert U/I rows)
# and emit the reconstructed table.  The oracle is simply the NEW
# snapshot itself, so the whole apply path — anti-join the deletes,
# overwrite the updates, append the inserts — is hash-pinned
# end-to-end as an exact round trip (apply(old, diff(old, new)) ==
# new), the property a lakehouse MERGE INTO must satisfy.
_V08_ORACLE = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 11 = 0 THEN 'X'
            ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN o_orderkey % 7 = 0 THEN '9-SYNTH'
            ELSE o_orderpriority END AS o_orderpriority
FROM orders WHERE o_orderkey % {_V07_NEW_MOD} <> 0
"""


@q("v08_cdc_apply", oracle=_V08_ORACLE)
def v08(spark, sf):
    """Apply v07's changelog to the OLD snapshot with MERGE semantics
    and return the reconstructed table; the oracle is the NEW snapshot
    directly, hash-pinning the diff→apply round trip.

    Scale shape: the changelog is churn-sized (v07's output), so the
    delete/update arm is a LEFT ANTI join of the 100 TB base against a
    small relation — AQE broadcasts it — followed by a union with the
    upserted rows (update new-values + inserts), which never touches
    the base at all.  One broadcast anti-join + one append: exactly
    the physical plan Delta/Iceberg MERGE compiles to when the source
    is small relative to the target, with no full-table shuffle
    anywhere."""
    from pyspark.sql import functions as F

    old = (
        t(spark, sf, "orders")
        .where(F.col("o_orderkey") % _V07_OLD_MOD != 0)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )
    log = QUERIES["v07_snapshot_diff"](spark, sf)
    # D + U keys leave the base (U rows re-enter with new values).
    touched = log.where(F.col("op") != "I").select("o_orderkey")
    upserts = log.where(F.col("op") != "D").select(
        "o_orderkey",
        F.col("new_status").alias("o_orderstatus"),
        F.col("new_priority").alias("o_orderpriority"),
    )
    return old.join(touched, "o_orderkey", "left_anti").unionByName(
        upserts
    )


# ------------------------------------------------------------- v09
# SCD Type-2 dimension history — the warehouse operator the v07/v08
# pair feeds: fold the two snapshots into a versioned history table
# (Kimball slowly-changing-dimension type 2, public).  Version ids are
# the snapshot ordinals (1 = OLD, 2 = NEW); an open row carries
# ver_to = 0 (sentinel for "no successor
# version"; NULL round-trips as NaN through the pandas comparator) +
# is_current = true.  Unchanged keys keep ONE open
# row anchored at v1; changed keys close the v1 row at v2 and open a
# v2 row; deletes close at v2 with no successor; inserts open at v2.
_V09_ORACLE = f"""
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % {_V07_OLD_MOD} <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN '9-SYNTH'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % {_V07_NEW_MOD} <> 0
),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         o.o_orderstatus AS os, o.o_orderpriority AS op_,
         n.o_orderstatus AS ns, n.o_orderpriority AS np,
         (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
          AND (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
               OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority))
           AS changed
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT k AS o_orderkey, os AS o_orderstatus, op_ AS o_orderpriority,
       1 AS ver_from,
       CASE WHEN changed OR NOT in_new THEN 2 ELSE 0 END AS ver_to,
       (NOT changed AND in_new) AS is_current
FROM j WHERE in_old
UNION ALL
SELECT k, ns, np, 2, 0, TRUE
FROM j WHERE in_new AND (changed OR NOT in_old)
"""


@q("v09_scd2_history", oracle=_V09_ORACLE)
def v09(spark, sf):
    """SCD Type-2 history build over the v07 snapshot pair: one
    history row per (key, version span) — unchanged keys stay open at
    v1, changed keys close v1 and open v2, deletes close v1 with no
    successor, inserts open at v2; ver_to 0 + is_current mark the
    open row (0, not NULL: see the block comment).

    Scale shape: the SAME single full-outer primary-key join as v07
    (zero extra exchanges — the history rows are two scan-local
    projections of the join, unioned), so building the type-2 history
    costs exactly one snapshot diff at any scale; on
    bucketed/partitioned lakehouse tables the join is a per-bucket
    zipper merge.  At N snapshots the operator folds pairwise
    (each day's diff appends to the history), which is how a
    production SCD2 table is maintained — never by re-scanning all
    history."""
    from pyspark.sql import functions as F

    base = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    old = base.where(F.col("o_orderkey") % _V07_OLD_MOD != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("os"),
        F.col("o_orderpriority").alias("op_"),
    )
    new = (
        base.where(F.col("o_orderkey") % _V07_NEW_MOD != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("ns"),
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("9-SYNTH"))
            .otherwise(F.col("o_orderpriority"))
            .alias("np"),
        )
    )
    j = (
        old.alias("o")
        .join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
        .select(
            F.coalesce("o.k", "n.k").alias("k"),
            F.col("o.k").isNotNull().alias("in_old"),
            F.col("n.k").isNotNull().alias("in_new"),
            "os",
            "op_",
            "ns",
            "np",
            (
                F.col("o.k").isNotNull()
                & F.col("n.k").isNotNull()
                & (
                    ~F.col("os").eqNullSafe(F.col("ns"))
                    | ~F.col("op_").eqNullSafe(F.col("np"))
                )
            ).alias("changed"),
        )
    )
    hist_old = j.where("in_old").select(
        F.col("k").alias("o_orderkey"),
        F.col("os").alias("o_orderstatus"),
        F.col("op_").alias("o_orderpriority"),
        F.lit(1).alias("ver_from"),
        F.when(F.col("changed") | ~F.col("in_new"), 2)
        .otherwise(0)
        .cast("int")
        .alias("ver_to"),
        (~F.col("changed") & F.col("in_new")).alias("is_current"),
    )
    hist_new = j.where(
        F.col("in_new") & (F.col("changed") | ~F.col("in_old"))
    ).select(
        F.col("k").alias("o_orderkey"),
        F.col("ns").alias("o_orderstatus"),
        F.col("np").alias("o_orderpriority"),
        F.lit(2).alias("ver_from"),
        F.lit(0).cast("int").alias("ver_to"),
        F.lit(True).alias("is_current"),
    )
    return hist_old.unionByName(hist_new)


# ------------------------------------------------------------- v10
# Incremental view maintenance — the materialized-view delta-update
# the CDC family exists to feed: maintain a grouped COUNT aggregate
# under the v07 changelog WITHOUT rescanning the base.  Each op
# contributes exact group deltas (I: +1 new group; D: -1 old group;
# U: -1 old group, +1 new group — a no-op when the group key didn't
# change), merged into the OLD aggregate.  The oracle is the DIRECT
# GROUP BY over the NEW snapshot, so the delta algebra is hash-pinned
# against full recomputation.
_V10_ORACLE = f"""
SELECT CASE WHEN o_orderkey % 7 = 0 THEN '9-SYNTH'
            ELSE o_orderpriority END AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey % {_V07_NEW_MOD} <> 0
GROUP BY 1
"""


@q("v10_ivm_counts", oracle=_V10_ORACLE)
def v10(spark, sf):
    """Incrementally maintain per-priority counts under the v07
    changelog: old aggregate + exact per-op group deltas; the oracle
    recomputes the aggregate directly on the NEW snapshot, pinning
    the delta algebra against full recomputation.

    Scale shape: the base table is scanned ONCE at view creation (the
    OLD aggregate — here one partial-aggregated Exchange); every
    refresh afterwards touches only the churn-sized changelog (explode
    each op into ±1 group deltas scan-local, ONE tiny Exchange on the
    group key, outer-merge with the dictionary-sized old aggregate).
    Refresh cost is O(churn + |groups|) independent of base size —
    the property that makes materialized views viable on a 100 TB
    fact table."""
    from pyspark.sql import functions as F

    old_agg = (
        t(spark, sf, "orders")
        .where(F.col("o_orderkey") % _V07_OLD_MOD != 0)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_old"))
    )
    log = QUERIES["v07_snapshot_diff"](spark, sf)
    # each op -> array of (group, ±1) deltas, exploded scan-local
    deltas = log.select(
        F.explode(
            F.when(
                F.col("op") == "I",
                F.array(F.struct(F.col("new_priority").alias("g"),
                                 F.lit(1).alias("d"))),
            )
            .when(
                F.col("op") == "D",
                F.array(F.struct(F.col("old_priority").alias("g"),
                                 F.lit(-1).alias("d"))),
            )
            .otherwise(
                F.array(
                    F.struct(F.col("old_priority").alias("g"),
                             F.lit(-1).alias("d")),
                    F.struct(F.col("new_priority").alias("g"),
                             F.lit(1).alias("d")),
                )
            )
        ).alias("x")
    ).select("x.*")
    dsum = deltas.groupBy(F.col("g").alias("o_orderpriority")).agg(
        F.sum("d").alias("dn")
    )
    return (
        old_agg.join(dsum, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (
                F.coalesce("n_old", F.lit(0))
                + F.coalesce("dn", F.lit(0))
            ).cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
    )


# ------------------------------------------------------------- v11
# Time travel — reconstruct the table AS OF version 1 from the v09
# SCD Type-2 history: rows whose validity span covers the version
# (ver_from <= 1 AND (open OR ver_to > 1)).  The oracle is the OLD
# snapshot itself, so history-build -> time-travel round-trips
# hash-pinned row-for-row (the complement of v08's diff -> apply pin;
# together they close the lakehouse family: diff / apply / history /
# incremental refresh / travel).
_V11_ORACLE = f"""
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders WHERE o_orderkey % {_V07_OLD_MOD} <> 0
"""


@q("v11_time_travel", oracle=_V11_ORACLE)
def v11(spark, sf):
    """AS OF version 1 over the v09 history: keep rows whose span
    covers v1; the oracle is the OLD snapshot directly.

    Scale shape: ONE scan-local filter over the history table — no
    join, no shuffle; on a history partitioned by ver_from (the
    natural layout, appends go to the newest partition) the filter
    partition-prunes to spans opened at or before the target
    version.  This is the query shape behind `VERSION AS OF` in
    Delta/Iceberg when the table is SCD2-modeled rather than
    snapshot-copied."""
    from pyspark.sql import functions as F

    hist = QUERIES["v09_scd2_history"](spark, sf)
    return hist.where(
        (F.col("ver_from") <= 1)
        & ((F.col("ver_to") == 0) | (F.col("ver_to") > 1))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


# ---------------------------------------------------------------- v12
# Benford's-law anomaly audit (public: Benford 1938; standard in data
# forensics / Deequ-adjacent quality stacks): the leading-digit
# distribution of a naturally-ranging numeric column follows
# p(d) = log10(1 + 1/d); a column that deviates (uniform ranges,
# capped enumerations, fabricated values) flags for review.  The
# expected probabilities are Python-computed integer PPM constants
# baked into BOTH engines, and the deviation statistic is an exact
# integer chi-square in ppm units — no libm at query time.  Two
# audited columns keep both verdict branches live: l_extendedprice
# (wide dynamic range, conforms) and l_quantity (uniform 1..50,
# violates).
_V12_EXP_PPM = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)
_V12_CHI2_MAX = 100_000  # micro chi-square conformity threshold

_V12_CASE_SQL = ", ".join(
    f"({p})" for p in _V12_EXP_PPM
)

_V12_ORACLE = f"""
WITH vals AS (
  SELECT col_name, CAST(floor(v) AS BIGINT) AS n
  FROM (
    SELECT unnest(['price', 'quantity']) AS col_name,
           unnest([l_extendedprice, CAST(l_quantity AS DOUBLE)]) AS v
    FROM lineitem)
  WHERE v >= 1
),
digits AS (
  SELECT col_name,
         CAST(n // CAST(pow(10, length(CAST(n AS VARCHAR)) - 1)
                        AS BIGINT) AS INTEGER) AS digit
  FROM vals
),
spine AS (
  SELECT c.col_name, d.digit
  FROM (SELECT unnest(['price', 'quantity']) AS col_name) c,
       (SELECT unnest(generate_series(1, 9)) AS digit) d
),
cnt AS (
  SELECT s.col_name, s.digit,
         CAST(COALESCE(g.cnt, 0) AS BIGINT) AS cnt
  FROM spine s
  LEFT JOIN (SELECT col_name, digit, count(*) AS cnt
             FROM digits GROUP BY col_name, digit) g
    ON g.col_name = s.col_name AND g.digit = s.digit
),
ppm AS (
  SELECT col_name, digit, cnt,
         sum(cnt) OVER (PARTITION BY col_name) AS n_col,
         (cnt * 1000000) // sum(cnt) OVER (PARTITION BY col_name)
           AS obs_ppm,
         ([{_V12_CASE_SQL}])[digit] AS exp_ppm
  FROM cnt
)
SELECT col_name, digit, cnt, CAST(obs_ppm AS BIGINT) AS obs_ppm,
       CAST(exp_ppm AS BIGINT) AS exp_ppm,
       CAST(sum((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) // exp_ppm)
              OVER (PARTITION BY col_name) AS BIGINT) AS chi2_micro,
       sum((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) // exp_ppm)
         OVER (PARTITION BY col_name) <= {_V12_CHI2_MAX} AS conforms
FROM ppm
"""


@q("v12_benford_audit", oracle=_V12_ORACLE)
def v12(spark, sf):
    """Benford leading-digit audit: per (column, digit 1..9) the
    observed count and exact obs/exp ppm, plus the per-column integer
    chi-square and the conformity verdict.

    Scale shape: ONE scan of the fact table stacked to (col, value)
    long form JVM-side, one partial-aggregated Exchange on
    (col, digit) — 18 output groups regardless of input size — then a
    broadcast-sized spine join and window over 9-row partitions.
    Everything after the first aggregate touches 18 rows."""
    from pyspark.sql import Window as W, functions as F

    li = t(spark, sf, "lineitem")
    vals = li.select(
        F.expr(
            "stack(2, 'price', l_extendedprice,"
            " 'quantity', CAST(l_quantity AS DOUBLE))"
        ).alias("col_name", "v")
    ).filter(F.col("v") >= 1)
    digits = vals.select(
        "col_name",
        F.expr(
            "CAST(CAST(floor(v) AS BIGINT) div CAST(pow(10,"
            " length(CAST(CAST(floor(v) AS BIGINT) AS STRING)) - 1)"
            " AS BIGINT) AS INT)"
        ).alias("digit"),
    )
    g = digits.groupBy("col_name", "digit").agg(
        F.count("*").cast("long").alias("cnt")
    )
    spine = (
        t(spark, sf, "lineitem")
        .sparkSession.range(1)
        .select(
            F.explode(F.array(F.lit("price"), F.lit("quantity"))).alias(
                "col_name"
            )
        )
        .select("col_name", F.explode(F.expr("sequence(1, 9)")).alias("digit"))
    )
    exp_arr = "array" + str(_V12_EXP_PPM)
    cnt = spine.join(g, ["col_name", "digit"], "left").select(
        "col_name",
        "digit",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
    )
    w = W.partitionBy("col_name")
    ppm = cnt.select(
        "col_name",
        "digit",
        "cnt",
        F.expr(
            f"(cnt * 1000000) div sum(cnt) OVER"
            f" (PARTITION BY col_name)"
        ).alias("obs_ppm"),
        F.expr(f"element_at({exp_arr}, digit)").cast("long").alias(
            "exp_ppm"
        ),
    )
    chi = F.sum(
        F.expr("(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div exp_ppm")
    ).over(w)
    return ppm.select(
        "col_name",
        "digit",
        "cnt",
        F.col("obs_ppm").cast("long"),
        "exp_ppm",
        chi.cast("long").alias("chi2_micro"),
        (chi <= _V12_CHI2_MAX).alias("conforms"),
    )


# ---------------------------------------------------------------- v13
# Functional-dependency audit (public: Deequ/Metanome-style FD
# profiling; Papenbrock et al. 2015 surveys discovery).  For each
# candidate A -> B: the number of A-groups, the groups holding more
# than one distinct B (violations), the integer-ppm violation rate,
# and the holds verdict.  The candidate list spans true FDs (primary
# keys, the nation->region hierarchy) and deliberately false ones so
# both verdict branches are live on every run.
_V13_FDS = (
    ("nation.n_nationkey->n_regionkey", "nation",
     "n_nationkey", "n_regionkey"),
    ("orders.o_orderkey->o_orderstatus", "orders",
     "o_orderkey", "o_orderstatus"),
    ("customer.c_nationkey->c_mktsegment", "customer",
     "c_nationkey", "c_mktsegment"),
    ("lineitem.l_orderkey->l_suppkey", "lineitem",
     "l_orderkey", "l_suppkey"),
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
)


def _v13_arm_sql(name, table, lhs, rhs):
    return f"""
SELECT '{name}' AS fd,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(1000000 * sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS viol_ppm,
       CAST(max(n_rhs) AS BIGINT) AS max_rhs,
       (sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (
  SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
  FROM {table} GROUP BY {lhs}
)"""


_V13_ORACLE = "\nUNION ALL\n".join(
    _v13_arm_sql(*fd) for fd in _V13_FDS
)


@q("v13_fd_audit", oracle=_V13_ORACLE)
def v13(spark, sf):
    """Functional-dependency discovery audit: for each candidate
    A -> B, the A-group count, violating-group count, ppm violation
    rate, worst group's distinct-B count, and the holds verdict —
    the schema-quality profile (Deequ's uniqueness/consistency
    family) that catches denormalization drift at ingest.

    Scale shape: each candidate is ONE shuffle on the LHS with a
    map-side partial distinct, collapsed to a single verdict row —
    the per-group relation never leaves the executors.  Candidates
    over the same table share the scan; at production the candidate
    list comes from the contract (a handful of rows), never the
    O(cols^2) blind search."""
    from pyspark.sql import functions as F

    outs = []
    for name, table, lhs, rhs in _V13_FDS:
        g = (
            t(spark, sf, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        viol = F.sum(
            F.when(F.col("n_rhs") > 1, 1).otherwise(0)
        )
        outs.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count("*").alias("n_groups"),
                viol.alias("n_violating"),
                F.expr(
                    "CAST(1000000 * sum(CASE WHEN n_rhs > 1 THEN 1"
                    " ELSE 0 END) div count(*) AS BIGINT)"
                ).alias("viol_ppm"),
                F.max("n_rhs").cast("long").alias("max_rhs"),
                (viol == 0).alias("holds"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------- v14
# Robust outlier detection (public: Iglewicz & Hoaglin 1993 modified
# z-score; the MAD-based screen Deequ-class quality suites run where
# mean/stddev break under the very outliers being hunted): per
# priority group over order totals, med = exact median, MAD =
# median(|x - med|), z = 0.6745 |x - med| / MAD, flag at z > 3.5.
# Totals compare as integer cents; a deterministic population
# (o_orderkey % 997 == 0 -> cents x 50, the t10/t11 injection
# pattern) keeps the outlier branch live on the uniform-ish corpus.
_V14_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           * (CASE WHEN o_orderkey % 997 = 0 THEN 50 ELSE 1 END)
           AS cents
  FROM orders
),
med AS (
  SELECT o_orderpriority, quantile_cont(cents, 0.5) AS med
  FROM base GROUP BY o_orderpriority
),
dev AS (
  SELECT b.*, m.med, abs(b.cents - m.med) AS adev
  FROM base b JOIN med m USING (o_orderpriority)
),
mad AS (
  SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderkey, d.o_orderpriority, d.cents,
       CAST(floor(1000 * 0.6745 * d.adev / nullif(a.mad, 0)) AS BIGINT)
         AS z_milli,
       0.6745 * d.adev / nullif(a.mad, 0) > 3.5 AS outlier
FROM dev d JOIN mad a USING (o_orderpriority)
"""


@q("v14_mad_outliers", oracle=_V14_ORACLE)
def v14(spark, sf):
    """MAD-based robust outlier screen: per priority group the exact
    median and median-absolute-deviation of order totals (integer
    cents), each order's milli modified z-score, and the z > 3.5
    outlier flag — the quality gate that survives the outliers
    themselves (mean/stddev screens don't).  A degenerate group with
    MAD = 0 (most totals identical) yields NULL z and NULL verdict
    on both engines: the screen abstains rather than divides by
    zero.

    Scale shape: two group-grain aggregates (exact percentile here;
    approx_percentile is the documented 100-TB swap — same plan, one
    config) broadcast back onto the scan; no row-stream window, no
    second scan.  The group medians are interpolated doubles computed
    from identical integer inputs in both engines (t18's quantile
    precedent), so z compares exactly at the milli freeze."""
    from pyspark.sql import functions as F

    base = t(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            * F.when(F.col("o_orderkey") % 997 == 0, 50).otherwise(1)
        ).alias("cents"),
    )
    med = base.groupBy("o_orderpriority").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = base.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    # MAD = 0 (a group where most totals share one cents value) emits
    # NULL z / NULL verdict on BOTH engines — without the nullif,
    # DuckDB's ANSI cast dies on floor(inf) while Spark returns a value
    z = 0.6745 * F.col("adev") / F.expr("nullif(mad, 0)")
    return dev.join(F.broadcast(mad), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.floor(1000 * z).cast("long").alias("z_milli"),
        (z > 3.5).alias("outlier"),
    )


# ---------------------------------------------------------------- v15
# Optimizer-statistics histograms (public: the ANALYZE TABLE ... FOR
# COLUMNS output every cost-based optimizer consumes — Spark's own
# CBO stores exactly these): per monitored column both an EQUI-WIDTH
# histogram (8 fixed-width buckets over [min, max]) and an
# EQUI-DEPTH one (8 ntile tiles with their value boundaries) — width
# answers "where is the data", depth answers "where are the
# quantiles", and selectivity estimation needs both.  Values compare
# as exact integer cents/units, bucket math is integer throughout.
_V15_BUCKETS = 8
_V15_COLS = (
    ("o_totalprice_cents", "orders",
     "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
    ("o_shippriority_key", "orders",
     "CAST(o_orderkey % 1000 AS BIGINT)"),
)


def _v15_arm_sql(cname, table, expr):
    b = _V15_BUCKETS
    return f"""
SELECT '{cname}' AS col_name, 'width' AS kind,
       CAST(least({b - 1}, ({b} * (v - mn)) // nullif(mx - mn, 0))
            AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
FROM (SELECT {expr} AS v FROM {table}),
     (SELECT min({expr}) AS mn, max({expr}) AS mx FROM {table})
GROUP BY 3
UNION ALL
SELECT '{cname}', 'depth', CAST(tile - 1 AS INTEGER),
       CAST(count(*) AS BIGINT),
       CAST(min(v) AS BIGINT), CAST(max(v) AS BIGINT)
FROM (
  SELECT v, ntile({b}) OVER (ORDER BY v) AS tile
  FROM (SELECT {expr} AS v FROM {table})
)
GROUP BY 3"""


_V15_ORACLE = "\nUNION ALL\n".join(
    _v15_arm_sql(*c) for c in _V15_COLS
)


@q("v15_column_histograms", oracle=_V15_ORACLE)
def v15(spark, sf):
    """CBO column statistics: for each monitored column an equi-width
    histogram (where the mass sits) and an equi-depth histogram
    (where the quantile boundaries sit), each bucket carrying its row
    count and value bounds — the ANALYZE output selectivity
    estimation reads.

    Scale shape: equi-width is scan-local bucket math + one tiny
    aggregate (min/max broadcast from a single-row agg).  Equi-depth
    uses t18's VALUE-HISTOGRAM method, never a global ntile (which
    sorts every row through one partition): one groupBy to the
    (col_name, value) histogram — bounded by distinct values, not
    rows — then cumulative rank ranges over the histogram with
    windows PARTITIONED by col_name (col_name plays t18's lang
    role), and each value explodes to the ntile buckets its rank
    range [cum-c+1, cum] spans (≤ _V15_BUCKETS rows per value).
    Bucket row counts are closed-form from n (the first n mod
    _V15_BUCKETS tiles get one extra row), and tile lo/hi bounds
    are min/max over spanning values —
    identical output to the sort-based ntile for any tie layout,
    because tied rows occupy a contiguous rank block wherever the
    sort puts them individually."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    b = _V15_BUCKETS
    outs = []
    vs = None
    for cname, table, expr in _V15_COLS:
        v = t(spark, sf, table).select(F.expr(expr).alias("v"))
        tagged = v.select(F.lit(cname).alias("col_name"), "v")
        vs = tagged if vs is None else vs.unionByName(tagged)
        mm = v.agg(
            F.min("v").alias("mn"), F.max("v").alias("mx")
        )
        width = (
            v.crossJoin(F.broadcast(mm))
            .select(
                F.expr(
                    f"CAST(least({b - 1}, ({b} * (v - mn))"
                    f" div nullif(mx - mn, 0)) AS INT)"
                ).alias("bucket"),
                "v",
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .select(
                F.lit(cname).alias("col_name"),
                F.lit("width").alias("kind"),
                "bucket",
                F.col("n_rows").cast("long"),
                F.col("lo").cast("long"),
                F.col("hi").cast("long"),
            )
        )
        outs.append(width)
    h = vs.groupBy("col_name", "v").agg(F.count("*").alias("c"))
    wcum = (
        W.partitionBy("col_name")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy("col_name")
    h = h.select(
        "col_name",
        "v",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    # 0-based ntile bucket of 1-based rank r, with q = n div b tiles of
    # base size and the first m = n % b tiles holding one extra row
    def _bkt(r: str) -> str:
        return (
            f"CASE WHEN {r} <= (n div {b} + 1) * (n % {b})"
            f" THEN ({r} - 1) div (n div {b} + 1)"
            f" ELSE (n % {b}) + ({r} - 1 - (n div {b} + 1) * (n % {b}))"
            f" div greatest(n div {b}, 1) END"
        )

    spans = h.select(
        "col_name",
        "v",
        "n",
        F.expr(
            f"explode(sequence({_bkt('(cum - c + 1)')}, {_bkt('cum')}))"
        ).alias("bucket"),
    )
    depth = (
        spans.groupBy("col_name", "bucket")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.max("n").alias("n"),
        )
        .select(
            "col_name",
            F.lit("depth").alias("kind"),
            F.col("bucket").cast("int").alias("bucket"),
            F.expr(
                f"CAST(CASE WHEN bucket < n % {b} THEN n div {b} + 1"
                f" ELSE n div {b} END AS BIGINT)"
            ).alias("n_rows"),
            F.col("lo").cast("long"),
            F.col("hi").cast("long"),
        )
    )
    outs.append(depth)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------- v16
# Constraint suggestion -> verification (public: Schelter et al. 2018,
# "Automating large-scale data quality verification", VLDB — Deequ's
# ConstraintSuggestion + VerificationSuite flow): PROFILE a trusted
# baseline table into candidate constraints (completeness, uniqueness,
# numeric range, small-domain containment), keep the candidates the
# baseline itself satisfies ("suggested"), then VERIFY a new batch
# against the suggested set and report per-constraint violation counts
# + hold verdicts.  A candidate the profiler declines (o_orderdate
# in_set: cardinality above the domain threshold) is emitted with a
# -1 violation sentinel and 'not_checked' verdict — not-suggested means
# not-checked, and the negative branch stays live in every corpus
# slice.  (-1, not NULL: a NULL BIGINT round-trips as NaN through
# pandas and would hash-diverge between collection paths.)
#
# The "new batch" is the baseline decorated with DETERMINISTIC
# corruptions (the t10/t11 injection pattern — the same expression
# inlined in both engines), one per constraint family, on disjoint
# modulus populations:
#   o_orderkey % 1013 == 0 -> o_orderpriority := NULL (completeness)
#   o_orderkey % 1021 == 0 -> o_orderkey := 1        (uniqueness dup)
#   o_orderkey % 1009 == 0 -> cents := cents * 1000  (range escape)
#   o_orderkey %  997 == 0 -> o_orderstatus := 'X'   (set escape)
_V16_SET_MAX = 10  # in_set suggested only when baseline cardinality <=

_V16_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(o_orderdate AS VARCHAR) AS odate, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
s AS (
  SELECT count(*) AS n,
         count(prio) AS nn_prio,
         count(o_orderstatus) AS nn_status,
         count(DISTINCT k) AS nd_key,
         count(DISTINCT o_orderstatus) AS nd_status,
         count(DISTINCT odate) AS nd_date,
         min(cents) AS lo, max(cents) AS hi,
         array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|')
           AS status_set
  FROM base
),
batch AS (
  SELECT CASE WHEN k % 1021 = 0 THEN 1 ELSE k END AS k,
         CASE WHEN k % 1013 = 0 THEN NULL ELSE prio END AS prio,
         CASE WHEN k % 997 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN k % 1009 = 0 THEN cents * 1000 ELSE cents END AS cents
  FROM base
),
b AS (
  SELECT count(*) AS n,
         count(batch.prio) AS nn_prio,
         count(batch.o_orderstatus) AS nn_status,
         count(DISTINCT batch.k) AS nd_key,
         sum(CASE WHEN batch.cents < s.lo OR batch.cents > s.hi
                  THEN 1 ELSE 0 END) AS range_viol,
         sum(CASE WHEN NOT list_contains(
                    string_split(s.status_set, '|'), batch.o_orderstatus)
                  THEN 1 ELSE 0 END) AS set_viol
  FROM batch, s
)
SELECT * FROM (
SELECT 'o_orderpriority' AS col_name, 'complete' AS kind,
       s.nn_prio = s.n AS suggested, '' AS param,
       CAST(b.n - b.nn_prio AS BIGINT) AS n_violations,
       CASE WHEN b.n - b.nn_prio = 0 THEN 'pass' ELSE 'fail' END AS verdict
FROM s, b
UNION ALL
SELECT 'o_orderstatus', 'complete', s.nn_status = s.n, '',
       CAST(b.n - b.nn_status AS BIGINT),
       CASE WHEN b.n - b.nn_status = 0 THEN 'pass' ELSE 'fail' END
FROM s, b
UNION ALL
SELECT 'o_orderkey', 'unique', s.nd_key = s.n, '',
       CAST(b.n - b.nd_key AS BIGINT),
       CASE WHEN b.n - b.nd_key = 0 THEN 'pass' ELSE 'fail' END
FROM s, b
UNION ALL
SELECT 'o_totalprice_cents', 'range', TRUE,
       CAST(s.lo AS VARCHAR) || '..' || CAST(s.hi AS VARCHAR),
       CAST(b.range_viol AS BIGINT),
       CASE WHEN b.range_viol = 0 THEN 'pass' ELSE 'fail' END
FROM s, b
UNION ALL
SELECT 'o_orderstatus', 'in_set', s.nd_status <= {_V16_SET_MAX},
       s.status_set, CAST(b.set_viol AS BIGINT),
       CASE WHEN b.set_viol = 0 THEN 'pass' ELSE 'fail' END
FROM s, b
UNION ALL
SELECT 'o_orderdate', 'in_set', s.nd_date <= {_V16_SET_MAX}, '',
       CAST(-1 AS BIGINT), 'not_checked'
FROM s, b
)
"""


@q("v16_constraint_suggestion", oracle=_V16_ORACLE)
def v16(spark, sf):
    """Deequ-style constraint suggestion + verification: profile the
    baseline orders table into candidate constraints (complete,
    unique, numeric range, small-domain in_set), mark which the
    baseline itself supports, then verify a deterministically
    corrupted new batch against the suggested set — one row per
    candidate with the violation count and pass/fail verdict (the
    declined candidate reads -1 / 'not_checked': not suggested means
    not checked; sentinels, not NULLs, so the row canon is identical
    on every collection path).

    Scale shape: the baseline profile is ONE wide aggregate over one
    scan (v04's plan, folded to a single broadcastable stats row);
    the batch verification is one more scan with the stats row
    cross-joined as a broadcast (range/set bounds are per-row
    constants) — two corpus scans, two single-row aggregates, zero
    row-scale shuffles.  Exact count_distincts become
    approx_count_distinct at 100 TB (same swap v04 documents)."""
    from pyspark.sql import functions as F

    base = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("string").alias("odate"),
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    s = base.agg(
        F.count("*").alias("n"),
        F.count("prio").alias("nn_prio"),
        F.count("o_orderstatus").alias("nn_status"),
        F.count_distinct("k").alias("nd_key"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.count_distinct("odate").alias("nd_date"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.expr(
            "array_join(array_sort(collect_set(o_orderstatus)), '|')"
        ).alias("status_set"),
    )
    batch = base.select(
        F.expr("CASE WHEN k % 1021 = 0 THEN 1 ELSE k END").alias("k"),
        F.expr(
            "CASE WHEN k % 1013 = 0 THEN NULL ELSE prio END"
        ).alias("prio"),
        F.expr(
            "CASE WHEN k % 997 = 0 THEN 'X' ELSE o_orderstatus END"
        ).alias("o_orderstatus"),
        F.expr(
            "CASE WHEN k % 1009 = 0 THEN cents * 1000 ELSE cents END"
        ).alias("cents"),
    )
    b = (
        batch.crossJoin(F.broadcast(s.select("lo", "hi", "status_set")))
        .agg(
            F.count("*").alias("bn"),
            F.count("prio").alias("bnn_prio"),
            F.count("o_orderstatus").alias("bnn_status"),
            F.count_distinct("k").alias("bnd_key"),
            F.sum(
                F.expr(
                    "CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END"
                )
            ).alias("range_viol"),
            F.sum(
                F.expr(
                    "CASE WHEN NOT array_contains("
                    "split(status_set, '\\\\|'), o_orderstatus)"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("set_viol"),
        )
    )
    j = s.crossJoin(F.broadcast(b))
    rows = [
        (
            "'o_orderpriority'", "'complete'", "nn_prio = n", "''",
            "CAST(bn - bnn_prio AS BIGINT)",
            "CASE WHEN bn - bnn_prio = 0 THEN 'pass' ELSE 'fail' END",
        ),
        (
            "'o_orderstatus'", "'complete'", "nn_status = n", "''",
            "CAST(bn - bnn_status AS BIGINT)",
            "CASE WHEN bn - bnn_status = 0 THEN 'pass' ELSE 'fail' END",
        ),
        (
            "'o_orderkey'", "'unique'", "nd_key = n", "''",
            "CAST(bn - bnd_key AS BIGINT)",
            "CASE WHEN bn - bnd_key = 0 THEN 'pass' ELSE 'fail' END",
        ),
        (
            "'o_totalprice_cents'", "'range'", "true",
            "concat(CAST(lo AS STRING), '..', CAST(hi AS STRING))",
            "CAST(range_viol AS BIGINT)",
            "CASE WHEN range_viol = 0 THEN 'pass' ELSE 'fail' END",
        ),
        (
            "'o_orderstatus'", "'in_set'",
            f"nd_status <= {_V16_SET_MAX}", "status_set",
            "CAST(set_viol AS BIGINT)",
            "CASE WHEN set_viol = 0 THEN 'pass' ELSE 'fail' END",
        ),
        (
            "'o_orderdate'", "'in_set'",
            f"nd_date <= {_V16_SET_MAX}", "''",
            "CAST(-1 AS BIGINT)", "'not_checked'",
        ),
    ]
    arms = [
        j.select(
            F.expr(c).alias("col_name"),
            F.expr(kd).alias("kind"),
            F.expr(sg).alias("suggested"),
            F.expr(pm).alias("param"),
            F.expr(nv).alias("n_violations"),
            F.expr(hd).alias("verdict"),
        )
        for c, kd, sg, pm, nv, hd in rows
    ]
    res = arms[0]
    for a in arms[1:]:
        res = res.unionByName(a)
    return res
