"""Extended analytics: rollup/grouping-sets aggregation, winnowing
fingerprints, and end-to-end dedup survivor materialization.

Rounds out the engine beyond the reference's operator set (SURVEY.md
§2.4 notes the reference has no grouping sets -- an analytics engine a
reference user switches to still needs them) and completes the dedup
story: d02/d04 emit candidate PAIRS, x-dedup here materializes the
surviving corpus (keep lowest doc_id per duplicate component edge).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import min_label_components, sql_dsum_expr, t
from .dedup import SQL_DOC_SHINGLES, _doc_shingles

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


# ---------------------------------------------------------------- q35
@q(
    "q35_rollup_revenue",
    oracle=f"""
SELECT coalesce(r.r_name, '<all>') AS region,
       coalesce(n.n_name, '<all>') AS nation,
       {sql_dsum_expr("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def q35(spark, sf):
    """Hierarchical rollup (region -> nation -> grand total) with
    decimal-exact sums; nulls from the rollup replaced by a sentinel so
    the value-hash comparison is unambiguous."""
    li = t(spark, sf, "lineitem")
    su = t(spark, sf, "supplier")
    na = t(spark, sf, "nation")
    re = t(spark, sf, "region")
    j = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            "revenue",
            "n_items",
        )
    )


# ---------------------------------------------------------------- t05
_WIN_K = 4  # shingle size (tokens)
_WIN_W = 5  # winnowing window


@q(
    "t05_winnowing_fingerprints",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - {_WIN_K - 1}),
           i -> struct_pack(pos := i,
                h := ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
                      || toks[i+2] || ' ' || toks[i+3]), 1, 8))::BIGINT))
           AS hs
  FROM toks
  WHERE len(toks) >= {_WIN_K}
),
wins AS (
  SELECT doc_id, u.w.pos AS pos, u.w.h AS h,
         min(u.w.h) OVER (PARTITION BY doc_id
                          ORDER BY u.w.pos
                          ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW)
           AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM grams, unnest(hs) AS u(w)
)
SELECT DISTINCT doc_id, h AS fingerprint
FROM wins
WHERE h = wmin AND pos >= {_WIN_W}
""",
)
def t05(spark, sf):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    public): k-gram hashes -> per-window minimum -> selected fingerprints.

    Pure window functions over the exploded k-gram stream -- the local
    min-selection is the same lag/frame machinery as sessionization, all
    JVM-side.  Scale: narrow map + one window per doc partition.
    """
    from .dedup import TOKEN_RE

    d = (
        t(spark, sf, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(TOKEN_RE), 0
            ).alias("toks"),
        )
        .filter(F.size("toks") >= _WIN_K)
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_WIN_K - 1}), "
                f"i -> struct(i as pos, "
                f"cast(conv(substring(md5(concat_ws(' ', toks[i-1], toks[i], "
                f"toks[i+1], toks[i+2])), 1, 8), 16, 10) as bigint) as h))"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    from pyspark.sql import Window as W

    win = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_WIN_W - 1), 0)
    )
    return (
        grams.withColumn("wmin", F.min("h").over(win))
        .filter((F.col("h") == F.col("wmin")) & (F.col("pos") >= _WIN_W))
        .select("doc_id", F.col("h").alias("fingerprint"))
        .distinct()
    )


# ---------------------------------------------------------------- x03
@q(
    "x03_dedup_survivors",
    oracle=f"""
WITH doc_sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM doc_sh a
  JOIN doc_sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dups AS (
  SELECT i.doc_b
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) >= 0.02
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
LEFT JOIN (SELECT DISTINCT doc_b FROM dups) x ON x.doc_b = d.doc_id
WHERE x.doc_b IS NULL
""",
)
def x03(spark, sf):
    """End-to-end dedup: materialize the surviving corpus.  Pair
    generation as d04 (inverted-index Jaccard, lang-blocked), keep policy
    = drop the higher doc_id of every duplicate pair (union-to-lowest
    representative after transitive propagation is policy; the common
    production choice, edge-drop, is used here).  Survivors come from a
    LEFT ANTI join -- no row ever duplicates.
    """
    doc_sh = _doc_shingles(spark, sf).persist()
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = doc_sh.alias("a"), doc_sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    jac = F.col("n_inter").cast("double") / (
        F.col("za.n") + F.col("zb.n") - F.col("n_inter")
    )
    dups = (
        inter.join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.02)
        .select("doc_b")
        .distinct()
    )
    d = t(spark, sf, "documents")
    return d.join(
        dups, d.doc_id == dups.doc_b, "left_anti"
    ).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------- q36
@q(
    "q36_melt_part_metrics",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE) FROM part
""",
)
def q36(spark, sf):
    """Wide->long unpivot via DataFrame.melt (SURVEY.md §2.9 — the
    reference's schema-agnostic unpivot re-expressed as the built-in
    relational operator; docpact unpivot.py:143-400 analogue).

    Scale: melt is a generate (explode) — no shuffle at all."""
    p = t(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.melt(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------- x05
_CC_JACCARD = 0.02


def _edges(spark, sf):
    """Near-dup edges: lang-blocked n-gram Jaccard >= threshold (d04's
    inverted-index formulation)."""
    doc_sh = _doc_shingles(spark, sf).persist()
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = doc_sh.alias("a"), doc_sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    jac = F.col("n_inter").cast("double") / (
        F.col("za.n") + F.col("zb.n") - F.col("n_inter")
    )
    return (
        inter.join(za, F.col("za.doc_id") == F.col("src"))
        .join(zb, F.col("zb.doc_id") == F.col("dst"))
        .filter(jac >= _CC_JACCARD)
        .select("src", "dst")
    )


_SQL_EDGES = f"""
doc_sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS n_inter
  FROM doc_sh a
  JOIN doc_sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT i.src, i.dst
  FROM inter i
  JOIN sizes za ON za.doc_id = i.src
  JOIN sizes zb ON zb.doc_id = i.dst
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter)
        >= {_CC_JACCARD}
)
"""


@q(
    "x05_dedup_components",
    oracle=f"""
WITH RECURSIVE {_SQL_EDGES},
und AS (SELECT src AS a, dst AS b FROM edges
        UNION SELECT dst, src FROM edges),
reach(node, r) AS (
  SELECT a, a FROM und UNION SELECT b, b FROM und
  UNION
  SELECT reach.node, und.b FROM reach JOIN und ON und.a = reach.r
)
SELECT node AS doc_id, min(r) AS component
FROM reach GROUP BY node
""",
)
def x05(spark, sf):
    """Transitive dedup clustering: connected components of the near-dup
    graph via min-label propagation (iterative joins to a fixed point).

    Every duplicate CLUSTER gets one representative (min doc_id) -- the
    policy production dedup needs (x03's edge-drop is the cheap
    approximation).  Scale: label propagation is O(diameter) rounds of
    an equi-join + min-agg shuffle; near-dup components have tiny
    diameters (chains are rare), so 5-15 rounds at any corpus size;
    each round's frontier shrinks as labels converge.  Oracle: DuckDB
    recursive-CTE reachability.
    """
    labels = min_label_components(_edges(spark, sf))
    return labels.select(F.col("node").alias("doc_id"), "component")


# ---------------------------------------------------------------- q46
# Market-basket co-occurrence (the A-Priori support-counting stage of
# association mining): per purchasing user the DISTINCT item basket
# (item = the 'k' field of the event props JSON), then support and
# lift for every item pair co-occurring in at least one basket.  Lift
# freezes to integer ppm (support * n_users * 1e6 div (cnt_a * cnt_b))
# so the ratio is engine-exact.
_Q46_ORACLE = """
WITH basket AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type = 'purchase'
),
cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM basket
        GROUP BY item),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM basket),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS support
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
)
SELECT p.item_a, p.item_b, p.support,
       ca.n AS n_a, cb.n AS n_b,
       CAST((p.support::HUGEINT * nu.n_users * 1000000)
            // (ca.n::HUGEINT * cb.n) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN cnt ca ON ca.item = p.item_a
JOIN cnt cb ON cb.item = p.item_b, nu
"""


@q("q46_copurchase_lift", oracle=_Q46_ORACLE)
def q46(spark, sf):
    """Item-pair co-occurrence with support and integer-ppm lift (the
    market-basket/association-mining primitive).

    Scale shape: ONE user_id shuffle builds distinct per-user baskets;
    the pair stage is a per-user self-join whose fan-out is bounded by
    basket size squared — the quantity A-Priori bounds by capping
    baskets (rank-cap hot users before pairing at production scale);
    pair counts shuffle on the (a, b) key with map-side partials; the
    per-item counts broadcast back onto the pair aggregate.  DuckDB
    verifies the identical algebra through its own join planner."""
    basket = (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .distinct()
    )
    # basket feeds three branches (pair self-join x2 + item counts):
    # persist the tiny distinct relation rather than re-shuffling events
    basket = basket.persist()
    cnt = basket.groupBy("item").agg(F.count("*").alias("n"))
    n_users = basket.select("user_id").distinct().count()
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").alias("support"))
    )
    ca = cnt.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .select(
            "item_a",
            "item_b",
            "support",
            "n_a",
            "n_b",
            # DECIMAL(38,0) intermediates: support * n_users * 1e6
            # overflows int64 once purchasing users reach ~3M (ANSI
            # mode would throw); exact integer div is unchanged
            F.expr(
                f"CAST(CAST(support AS DECIMAL(38,0)) * {n_users}"
                " * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


# ---------------------------------------------------------------- q48
# Z-order (Morton) layout clustering — the lakehouse data-layout
# optimization (Delta OPTIMIZE ZORDER / Iceberg sort-order): interleave
# the bits of two scan dimensions so one sort key clusters BOTH, and
# every file's min/max column stats prune range predicates on either
# dimension.  The query computes the 16-bit Morton key over two 8-bit
# dimensions of orders and reports, per 256-z-value layout bucket (the
# "file"), the row count and the covered (x, y) rectangle — the
# locality contract that makes the layout prune: a z-contiguous bucket
# covers a bounded 16x16 rectangle, never a full-width stripe.
#
# All math is integer bit arithmetic (shift/mask/or) — bit-identical in
# any engine, under any partitioning.
_Q48_BITS = 8


def _q48_morton(x: str, y: str, shift: str, lshift: str) -> str:
    """Morton interleave as an engine-neutral expression template."""
    terms = []
    for i in range(_Q48_BITS):
        terms.append(lshift.format(v=f"({shift.format(v=x, n=i)} & 1)", n=2 * i))
        terms.append(
            lshift.format(v=f"({shift.format(v=y, n=i)} & 1)", n=2 * i + 1)
        )
    return " + ".join(terms)


_Q48_SPARK_Z = _q48_morton(
    "x", "y", shift="shiftright({v}, {n})", lshift="shiftleft({v}, {n})"
)
_Q48_SQL_Z = _q48_morton("x", "y", shift="({v} >> {n})", lshift="({v} << {n})")

_Q48_ORACLE = f"""
WITH pts AS (
  SELECT CAST(o_custkey % 256 AS INTEGER) AS x,
         CAST(o_orderkey % 256 AS INTEGER) AS y
  FROM orders
),
z AS (SELECT x, y, {_Q48_SQL_Z} AS zkey FROM pts)
SELECT CAST(zkey // 256 AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(x) AS INTEGER) AS min_x, CAST(max(x) AS INTEGER) AS max_x,
       CAST(min(y) AS INTEGER) AS min_y, CAST(max(y) AS INTEGER) AS max_y
FROM z GROUP BY 1
"""


@q("q48_zorder_layout", oracle=_Q48_ORACLE)
def q48(spark, sf):
    """Morton-key layout buckets over orders: per 256-z-value bucket,
    the row count and covered (x, y) rectangle (always within one
    16x16 tile — the pruning guarantee z-ordering exists for).

    Scale shape: the z-key is a scan-local integer expression
    (WholeStageCodegen); at production the writer sorts by it
    (repartitionByRange(zkey) + sortWithinPartitions), after which
    parquet min/max stats prune range predicates on BOTH dimensions —
    the layout step is one range shuffle, amortized over every later
    scan.  The audit here is one map-side-combined aggregate on the
    bucket key."""
    pts = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 256).cast("int").alias("x"),
        (F.col("o_orderkey") % 256).cast("int").alias("y"),
    )
    z = pts.select("x", "y", F.expr(_Q48_SPARK_Z).alias("zkey"))
    return z.groupBy(
        F.expr("zkey div 256").cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


# ---------------------------------------------------------------- q49
# Salted skew join — the explicit hot-key mitigation (the technique AQE
# skew-join automates, spelled out as a plan the builder controls): a
# synthetic 70%-hot key would pin one reducer with 0.7N rows in a plain
# hash join; salting splits the fact side's hot key across `_Q49_SALTS`
# sub-partitions and replicates the (tiny) dim side once per salt, so
# the join key becomes (key, salt) and no partition exceeds ~max(hot/S,
# uniform) rows.  The salt never reaches the output, so the result is
# provably the plain join's — and the DuckDB oracle IS the plain join:
# two different physical strategies, value-hash-identical results.
_Q49_SALTS = 8

_Q49_ORACLE = """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
              ELSE CAST(l_orderkey % 1000 AS BIGINT) END AS skew_key,
         l_quantity
  FROM lineitem
),
dim AS (
  SELECT CAST(range AS BIGINT) AS skew_key,
         CAST(range * 7 % 100 AS INTEGER) AS attr
  FROM range(0, 1000)
)
SELECT f.skew_key, d.attr,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM fact f JOIN dim d ON d.skew_key = f.skew_key
GROUP BY f.skew_key, d.attr
"""


@q("q49_salted_skew_join", oracle=_Q49_ORACLE)
def q49(spark, sf):
    """Salted fact-dim join under a deterministic 70%-hot key, rolled
    up to key grain: (skew_key, attr, n_items, qty).

    Scale shape: the fact side salts with a row-local expression and
    shuffles ONCE on (key, salt) — the hot key spreads over
    {salts} sub-partitions instead of pinning one reducer; the dim side
    replicates x{salts} BEFORE its (tiny) broadcast/shuffle, the
    classic fragment-replicate trade.  The rollup re-aggregates the
    (key, salt) partials to key grain — map-side combined, exactly the
    partial-agg shape.  The DuckDB oracle runs the UNSALTED join, so
    the salt's result-neutrality is value-hash-pinned, and the unit
    test asserts the salted executed plan joins on the composite
    (key, salt) key."""
    li = t(spark, sf, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0).cast("long"))
        .otherwise((F.col("l_orderkey") % 1000).cast("long"))
        .alias("skew_key"),
        "l_quantity",
        # row-local salt: anything deterministic per row works — the
        # salt never reaches the output
        ((F.col("l_orderkey") + F.col("l_linenumber")) % _Q49_SALTS)
        .cast("int")
        .alias("salt"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("skew_key"),
        (F.col("id") * 7 % 100).cast("int").alias("attr"),
    )
    dim_salted = dim.crossJoin(
        spark.range(0, _Q49_SALTS).select(F.col("id").cast("int").alias("salt"))
    )
    joined = fact.join(dim_salted, ["skew_key", "salt"])
    return joined.groupBy("skew_key", "attr").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("qty"),
    )


q49.__doc__ = q49.__doc__.format(salts=_Q49_SALTS)


# ---------------------------------------------------------------- q50
@q(
    "q50_grouping_cube",
    oracle=f"""
SELECT coalesce(l_returnflag, '<all>') AS rf,
       coalesce(l_linestatus, '<all>') AS ls,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       {sql_dsum_expr("l_quantity", 2)} AS sum_qty,
       {sql_dsum_expr("l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q50(spark, sf):
    """CUBE aggregation with per-column GROUPING flags — the other
    half of the grouping-sets family (q35 covers ROLLUP; CUBE emits
    every subset of the grouping keys, and GROUPING() disambiguates a
    real NULL key from an aggregated-away one).  Sentinel-coalesced
    keys + integer flags keep the value hash unambiguous.

    Scale shape: two-phase — pre-aggregate on the FINEST grain first
    (one partial-aggregated Exchange over the row stream, exactly the
    shuffle a naive cube pays anyway), then CUBE the tiny
    (|rf| x |ls|)-row aggregate, so Spark's Expand (4 grouping sets x
    input) multiplies a handful of rows instead of the full scan.
    Partial sums stay DECIMAL through both phases (associative —
    regrouping partials is exact), so the result is bit-identical to
    the single-phase cube."""
    li = t(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pq"),
        F.sum(rev).alias("pr"),
        F.count("*").alias("pn"),
    )
    return (
        pre.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.sum("pq").cast("double").alias("sum_qty"),
            F.sum("pr").cast("double").alias("revenue"),
            F.sum("pn").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "g_rf",
            "g_ls",
            "sum_qty",
            "revenue",
            "n_items",
        )
    )


# ---------------------------------------------------------------- q51
@q(
    "q51_pivot_part_metrics",
    oracle="""
SELECT p_partkey,
       CAST(max(CASE WHEN metric = 'p_size' THEN value END)
            AS DOUBLE) AS p_size,
       CAST(max(CASE WHEN metric = 'p_retailprice' THEN value END)
            AS DOUBLE) AS p_retailprice,
       CAST(count(*) AS INTEGER) AS n_metrics
FROM (
  SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
  FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
  FROM part
)
GROUP BY p_partkey
""",
)
def q51(spark, sf):
    """PIVOT — the reverse of q36's melt, closing the reshape family
    in both directions (melt q36 / unpivot u01 / pivot q51): the long
    (key, metric, value) relation back to wide columns via Spark's
    groupBy().pivot() with an EXPLICIT value list.

    Scale shape: the explicit pivot values list is the contract — it
    keeps Spark from running a distinct-scan job to discover column
    names AND bounds the output schema (a 100-TB long table can hold
    millions of accidental metric names; production pivots always pin
    the list).  One partial-aggregated Exchange on the group key,
    exactly a groupBy-agg."""
    long = q36(spark, sf)
    return (
        long.groupBy("p_partkey")
        .pivot("metric", ["p_size", "p_retailprice"])
        .agg(F.max("value"))
        .join(
            long.groupBy("p_partkey").agg(
                F.count("*").cast("int").alias("n_metrics")
            ),
            "p_partkey",
        )
    )


# ---------------------------------------------------------------- q52
# Transitive closure / hierarchy walk — the recursive-CTE workload
# Spark famously lacks as syntax: every node of a deterministic forest
# (parent(n) = md5-hash % n, so parents are always SMALLER ids —
# acyclic by construction; roots where n % 7 == 0 or n == 0) resolves
# its ROOT and DEPTH.  The Spark answer is the iterative
# join-until-fixed-point with localCheckpoint lineage truncation
# (x05's pattern); the DuckDB oracle is the real WITH RECURSIVE, so
# the two formulations cross-check each other.
def _q52_parent_sql() -> str:
    return (
        "CASE WHEN doc_id = 0 OR doc_id % 7 = 0 THEN NULL"
        " ELSE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT) % doc_id END"
    )


_Q52_ORACLE = f"""
WITH RECURSIVE nodes AS (
  SELECT doc_id AS node, {_q52_parent_sql()} AS parent
  FROM documents
),
walk AS (
  SELECT node, parent AS cur, 1 AS depth FROM nodes
  WHERE parent IS NOT NULL
  UNION ALL
  SELECT w.node, n.parent, w.depth + 1
  FROM walk w JOIN nodes n ON n.node = w.cur
  WHERE n.parent IS NOT NULL
)
SELECT n.node,
       CAST(COALESCE(t.cur, n.node) AS BIGINT) AS root,
       CAST(COALESCE(t.depth, 0) AS INTEGER) AS depth
FROM nodes n
LEFT JOIN (
  SELECT node, cur, depth,
         row_number() OVER (PARTITION BY node ORDER BY depth DESC) rk
  FROM walk) t ON t.node = n.node AND t.rk = 1
"""


@q("q52_transitive_roots", oracle=_Q52_ORACLE)
def q52(spark, sf):
    """Transitive closure over a forest: each node's root ancestor and
    depth, via iterative parent-join to a fixed point — Spark's
    answer to WITH RECURSIVE (the DuckDB oracle IS the real recursive
    CTE, so the two formulations cross-check).

    Scale shape: O(depth) rounds of one equi-join each over the
    UNRESOLVED frontier only (resolved rows retire from the loop, so
    the joined relation shrinks every round); ONE localCheckpoint per
    round on the joined step (truncating lineage, x05's pitfall note)
    from which the resolved slice and the next frontier both derive
    lazily, and the frontier-empty probe reads the same materialized
    step — two jobs per round total.  With hash parents always
    smaller than the child, expected depth is O(log N) — ~15 rounds
    at 10^12 nodes.  Production alternative for deep chains: pointer
    doubling (q53), O(log depth) rounds at double the join width."""
    nodes = t(spark, sf, "documents").select(
        F.col("doc_id").alias("node"),
        F.expr(
            "CASE WHEN doc_id = 0 OR doc_id % 7 = 0 THEN NULL"
            " ELSE CAST(conv(substring(md5(CAST(doc_id AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT) % doc_id END"
        ).alias("parent"),
    ).persist()
    edges = nodes.filter(F.col("parent").isNotNull()).select(
        "node", "parent"
    )
    done = nodes.filter(F.col("parent").isNull()).select(
        "node",
        F.col("node").alias("root"),
        F.lit(0).cast("int").alias("depth"),
    )
    frontier = edges.select(
        "node", F.col("parent").alias("cur"), F.lit(1).alias("depth")
    ).localCheckpoint()
    out = [done]
    while True:
        step = frontier.join(
            nodes.select(F.col("node").alias("cur"), "parent"), "cur"
        ).localCheckpoint()
        out.append(
            step.filter(F.col("parent").isNull()).select(
                "node",
                F.col("cur").alias("root"),
                F.col("depth").cast("int").alias("depth"),
            )
        )
        frontier = step.filter(F.col("parent").isNotNull()).select(
            "node",
            F.col("parent").alias("cur"),
            (F.col("depth") + 1).alias("depth"),
        )
        if frontier.limit(1).count() == 0:
            break
    result = out[0]
    for part in out[1:]:
        result = result.unionByName(part)
    nodes.unpersist()
    return result


# ---------------------------------------------------------------- q53
@q("q53_pointer_doubling_roots", oracle=_Q52_ORACLE)
def q53(spark, sf):
    """Pointer-doubling transitive closure — q52's production
    alternative for DEEP chains, sharing q52's recursive-CTE oracle
    (identical output contract: node, root, depth).

    Instead of walking one parent per round (O(depth) rounds over a
    shrinking frontier), every node keeps a pointer (cur, depth) to an
    ancestor and each round substitutes the pointer's own pointer:
    cur <- ptr[cur].cur, depth <- depth + ptr[cur].depth.  Pointers
    reach the root in O(log depth) rounds — the classic parallel
    tradeoff: each round self-joins the FULL node set (no shrinking
    frontier), but a 10^6-deep chain resolves in 20 rounds instead of
    10^6.  One equi-join + localCheckpoint + not-done probe per round;
    every parent id exists in the mapping (parent(n) = hash % n < n),
    so the self-join is inner.  At 10^12 nodes each round is one
    co-partitioned shuffle on the pointer key; the done-bit keeps
    resolved rows carrying their final (root, depth) unchanged
    through remaining rounds."""
    m = t(spark, sf, "documents").select(
        F.col("doc_id").alias("node"),
        F.expr(
            "CASE WHEN doc_id = 0 OR doc_id % 7 = 0 THEN NULL"
            " ELSE CAST(conv(substring(md5(CAST(doc_id AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT) % doc_id END"
        ).alias("parent"),
    )
    m = m.select(
        "node",
        F.coalesce("parent", "node").alias("cur"),
        F.when(F.col("parent").isNull(), 0)
        .otherwise(1)
        .cast("int")
        .alias("depth"),
        F.col("parent").isNull().alias("done"),
    ).localCheckpoint()
    while m.filter(~F.col("done")).limit(1).count() > 0:
        ptr = m.select(
            F.col("node").alias("cur"),
            F.col("cur").alias("nxt"),
            F.col("depth").alias("jump"),
            F.col("done").alias("nxt_done"),
        )
        m = (
            m.join(ptr, "cur")
            .select(
                "node",
                F.when(F.col("done"), F.col("cur"))
                .otherwise(F.col("nxt"))
                .alias("cur"),
                F.when(F.col("done"), F.col("depth"))
                .otherwise(F.col("depth") + F.col("jump"))
                .cast("int")
                .alias("depth"),
                (F.col("done") | F.col("nxt_done")).alias("done"),
            )
            .localCheckpoint()
        )
    return m.select("node", F.col("cur").alias("root"), "depth")


# ---------------------------------------------------------------- q54
# Pareto skyline (public: Borzsony/Kossmann/Stocker 2001, "The
# Skyline Operator"): per brand, the parts not dominated on
# (minimize price, maximize size) — a dominates b when a is no worse
# on both axes and strictly better on one.  The naive formulation is
# the O(N^2) NOT EXISTS anti-join; the 2-D skyline collapses to ONE
# window: group rows by price, take each price group's max size, and
# keep a group iff its max size strictly exceeds the running max over
# all CHEAPER groups (rows below their own group's max are dominated
# at equal price; duplicates of the frontier point tie and both
# survive).  Prices compare as exact integer cents (floor(p*100+0.5)
# spelled identically in both engines — Spark CAST truncates where
# DuckDB rounds, so neither engine's CAST is used on the raw double).
_Q54_ORACLE = """
WITH base AS (
  SELECT p_brand, p_partkey, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
),
grp AS (
  SELECT p_brand, cents, max(p_size) AS gmax
  FROM base GROUP BY p_brand, cents
),
front AS (
  SELECT p_brand, cents, gmax,
         max(gmax) OVER (PARTITION BY p_brand ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS run
  FROM grp
)
SELECT b.p_brand, b.p_partkey, b.cents, b.p_size
FROM base b
JOIN front f ON f.p_brand = b.p_brand AND f.cents = b.cents
WHERE b.p_size = f.gmax AND (f.run IS NULL OR f.gmax > f.run)
"""


def pareto_skyline(base, part_col, cost_col, gain_col):
    """2-D skyline of ``base`` per ``part_col``: rows not dominated on
    (minimize cost_col, maximize gain_col).  The one-window
    formulation q54 documents; reusable over any relation."""
    from pyspark.sql import Window as W

    grp = base.groupBy(part_col, cost_col).agg(
        F.max(gain_col).alias("gmax")
    )
    w = (
        W.partitionBy(part_col)
        .orderBy(cost_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    front = (
        grp.withColumn("run", F.max("gmax").over(w))
        .filter(F.col("run").isNull() | (F.col("gmax") > F.col("run")))
        .select(part_col, cost_col, "gmax")
    )
    return base.join(F.broadcast(front), [part_col, cost_col]).filter(
        F.col(gain_col) == F.col("gmax")
    )


@q("q54_pareto_skyline", oracle=_Q54_ORACLE)
def q54(spark, sf):
    """Per-brand Pareto skyline on (min price, max size) via the 2-D
    one-window formulation — no O(N^2) dominance join.

    Scale shape: ONE shuffle on (brand, cents) for the price-group
    aggregate (map-side partial max), ONE window over the price-GRAIN
    relation (distinct prices per brand — orders of magnitude smaller
    than the row stream), and the frontier groups broadcast back onto
    the base scan as an equi-join filter.  The row stream is never
    window-sorted; higher dimensions (k-D skylines) decompose into
    block-local skylines unioned then re-skylined — the same
    partial/final split as any algebraic aggregate."""
    base = t(spark, sf, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.expr(
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)"
        ).alias("cents"),
    )
    return pareto_skyline(base, "p_brand", "cents", "p_size").select(
        "p_brand", "p_partkey", "cents", "p_size"
    )


# ---------------------------------------------------------------- q56
# Triangle census (public: the standard distributed triangle count —
# node-iterator with ordered edges, e.g. Suri & Vassilvitskii 2011
# "Counting Triangles and the Curse of the Last Reducer") over the
# near-dup candidate graph: triangles distinguish dup CLUSTERS
# (dense, transitive — safe to collapse to one canonical doc) from
# dup CHAINS (A~B~C without A~C — collapsing loses documents), the
# QA signal for d12's connected-component collapse policy.  The
# graph is d02's verified pair relation with canonical a < b
# orientation, so each triangle (a < b < c) is counted exactly once
# by two equi-joins — never an all-pairs stage.
_Q56_ORACLE = f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({{d02}}) _p
),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.doc_a = e1.doc_b
  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
tcount AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT doc_a AS node FROM pairs
    UNION ALL SELECT doc_b FROM pairs
  ) GROUP BY node
)
SELECT d.node AS doc_id, CAST(d.degree AS INTEGER) AS degree,
       CAST(COALESCE(t.n_tri, 0) AS INTEGER) AS n_triangles,
       CAST(CASE WHEN d.degree < 2 THEN 0
            ELSE 1000000 * 2 * COALESCE(t.n_tri, 0)
                 // (d.degree * (d.degree - 1)) END AS BIGINT)
         AS clustering_ppm
FROM deg d LEFT JOIN tcount t ON t.node = d.node
"""


@q("q56_triangle_census")
def q56(spark, sf):
    """Triangle census over the near-dup candidate graph: per
    document its degree, triangle participation count, and
    integer-ppm local clustering coefficient — dense transitive dup
    clusters read ~1.0, chains read 0, which is the QA gate on the
    connected-component collapse policy (d12).

    Scale shape: ordered edges (a < b) make each triangle countable
    by exactly TWO equi-joins on node ids (the node-iterator
    algorithm); at web scale the standard high-degree mitigation
    (orient edges low-degree -> high-degree first) drops in without
    changing the result.  The edge relation is d02's verified-pair
    output — candidate-bounded, never all-pairs."""
    from .dedup import QUERIES as DQ

    pairs = DQ["d02_minhash_lsh_dedup"](spark, sf).select(
        "doc_a", "doc_b"
    ).persist()
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    tcount = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return deg.join(tcount, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.col("degree").cast("int").alias("degree"),
        F.coalesce("n_tri", F.lit(0)).cast("int").alias("n_triangles"),
        F.expr(
            "CAST(CASE WHEN degree < 2 THEN 0"
            " ELSE 1000000 * 2 * COALESCE(n_tri, 0)"
            " div (degree * (degree - 1)) END AS BIGINT)"
        ).alias("clustering_ppm"),
    )

from .dedup import ORACLE as _DORACLE  # noqa: E402  (d02's oracle text)

ORACLE["q56_triangle_census"] = _Q56_ORACLE.format(
    d02=_DORACLE["d02_minhash_lsh_dedup"]
)
