"""Set operations + array/higher-order functions (SURVEY.md §2.7, §2.8):
union/intersect/except, array dedup-preserving ops, token explode
(UDTF-analogue)."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

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


@q(
    "q19_union_distinct_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def q19(spark, sf):
    """page-set union (docpact filter.py:293-330)."""
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@q(
    "q20_intersect_brands",
    oracle="""
SELECT p.p_brand AS brand FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE l.l_quantity > 45
INTERSECT
SELECT p.p_brand FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE l.l_discount > 0.08
""",
)
def q20(spark, sf):
    """set intersection (docpact unpivot.py:239-242 suffix-index sets)."""
    p = t(spark, sf, "part")
    li = t(spark, sf, "lineitem")
    a = (
        li.filter(F.col("l_quantity") > 45)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("p_brand").alias("brand"))
    )
    b = (
        li.filter(F.col("l_discount") > 0.08)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("p_brand").alias("brand"))
    )
    return a.intersect(b)


@q(
    "q21_except_brands",
    oracle="""
SELECT p_brand AS brand FROM part
EXCEPT
SELECT p.p_brand FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE l.l_quantity > 49
""",
)
def q21(spark, sf):
    """set difference (docpact pipeline.py:195-202 alias-set difference)."""
    p = t(spark, sf, "part")
    li = t(spark, sf, "lineitem")
    sold_big = (
        li.filter(F.col("l_quantity") > 49)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("p_brand").alias("brand"))
    )
    # subtract = set-semantics EXCEPT (exceptAll would be bag semantics)
    return p.select(F.col("p_brand").alias("brand")).subtract(sold_big)


@q(
    "q22_word_stats",
    oracle="""
SELECT doc_id,
       LEN(STRING_SPLIT(text, ' ')) AS n_words,
       LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct_words,
       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1:5], ',')
         AS first5_sorted
FROM documents
""",
)
def q22(spark, sf):
    """array ops: split / distinct / sort / slice / join (docpact
    interpret.py:701-745 dedup-preserving merges)."""
    d = t(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(words)), 1, 5), ","
        ).alias("first5_sorted"),
    )


@q(
    "q23_token_explode_top20",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
""",
)
def q23(spark, sf):
    """explode ≈ UDTF (SURVEY.md §2.11)."""
    d = t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@q(
    "q24_arrays_overlap_langs",
    oracle="""
WITH doc_words AS (
  SELECT doc_id, lang, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS words
  FROM documents)
SELECT lang,
       CAST(SUM(CASE WHEN LEN(LIST_INTERSECT(words,
           ['data', 'table', 'query', 'join'])) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       COUNT(*) AS n_docs
FROM doc_words GROUP BY lang
""",
)
def q24(spark, sf):
    """arrays_overlap / array_intersect (docpact interpret.py:1577-1584
    section-labels ∩ aliases semi-join)."""
    d = t(spark, sf, "documents")
    kw = F.array(*[F.lit(w) for w in ["data", "table", "query", "join"]])
    words = F.array_distinct(F.split("text", " "))
    return (
        d.select("lang", F.arrays_overlap(words, kw).alias("hit"))
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_overlap"),
            F.count("*").alias("n_docs"),
        )
    )


@q(
    "q25_distinct_counts",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def q25(spark, sf):
    """distinct-cardinality stats — the reference's ENUM detection input
    (docpact heuristics.py:175-239); exact here, approx variant in
    q26 (rows-only)."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@q(
    "q26_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS hll_within_10pct
FROM lineitem GROUP BY l_returnflag
""",
)
def q26(spark, sf):
    """approx_count_distinct (HLL) validated against the exact count.

    The HLL estimate itself is engine-specific, so the oracle-checked
    output is the exact count plus the deterministic claim that the
    sketch landed within 10% of it (Spark's HLL is a hash-based sketch
    whose merge is commutative/associative — same input → same estimate
    regardless of partitioning, so the boolean is stable).  Exact twin
    with raw estimates: q25."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey")
                - F.countDistinct("l_partkey")
            )
            <= 0.10 * F.countDistinct("l_partkey")
        ).alias("hll_within_10pct"),
    )
