"""Relational core: scans, filters, aggregations, joins (SURVEY.md §2.1,
§2.2, §2.3, §2.4). Each query has a DuckDB oracle twin.

Plan notes (verified via .explain — see tests/test_plans.py):
  - q02 pushes both filters and a 3-column projection into the scan;
  - q05/q07 broadcast the dimension side (region/nation/customer are
    tiny); lineitem⋈orders stays a shuffle join on the key — correct at
    100 TB where both sides are huge;
  - all aggregates are partial (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import dsum, dsum_expr, sql_dsum, sql_dsum_expr, t

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


# --------------------------------------------------------------------- q01


@q(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_dsum('l_quantity')} / COUNT(*) AS avg_qty,
       {sql_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
       {sql_dsum('l_discount')} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01(spark, sf):
    li = t(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc_price).alias("sum_disc_price"),
            dsum_expr(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------- q02


@q(
    "q02_filter_project",
    oracle="""
SELECT l_orderkey, l_extendedprice, l_discount
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_quantity < 10
""",
)
def q02(spark, sf):
    # projection + predicates reach the parquet scan (PushedFilters)
    return (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_quantity") < 10)
        )
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )


# --------------------------------------------------------------------- q03


@q(
    "q03_revenue_topk",
    oracle=f"""
SELECT o.o_orderkey,
       {sql_dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
)
def q03(spark, sf):
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum_expr(rev).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------- q04


@q(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
)
def q04(spark, sf):
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------- q05


@q(
    "q05_local_supplier",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q05(spark, sf):
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    s = t(spark, sf, "supplier")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(rev).alias("revenue"))
    )


# --------------------------------------------------------------------- q06


@q(
    "q06_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum_expr('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.08
  AND l_quantity < 30
""",
)
def q06(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_quantity") < 30)
    ).agg(dsum_expr(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# --------------------------------------------------------------------- q07


@q(
    "q07_brand_price",
    oracle=f"""
SELECT p.p_brand,
       {sql_dsum('l.l_extendedprice')} / COUNT(*) AS avg_price,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def q07(spark, sf):
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------- q08


@q(
    "q08_customers_without_orders",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_inactive
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""",
)
def q08(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_inactive"))
    )


# --------------------------------------------------------------------- q09


@q(
    "q09_shipped_parts",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p_brand
""",
)
def q09(spark, sf):
    p = t(spark, sf, "part")
    li = t(spark, sf, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


# --------------------------------------------------------------------- q10


@q(
    "q10_range_join",
    oracle=f"""
SELECT STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       COUNT(*) AS n_shipments,
       {sql_dsum('l.l_quantity')} AS qty
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
GROUP BY STRFTIME(o.o_orderdate, '%Y-%m-%d')
""",
)
def q10(spark, sf):
    """Interval-overlap join — the reference's header↔column bbox matching
    shape (docpact compress.py:1549-1638) expressed as an equi+range join
    (equi key first so Catalyst plans a hash join, not a cross product)."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.count("*").alias("n_shipments"), dsum("l_quantity").alias("qty"))
    )
