"""Document classification operators (the reference's table-classification
family re-expressed over the ``documents`` table).

Reference semantics (NOT code):
  - keyword classification with suffix tolerance and best-score-wins
    ............................... docpact classify.py:142-261, 34-46
  - similarity propagation: unmatched items adopt the category of the
    most similar classified profile, score = 0.5*size-ratio +
    0.5*token-Jaccard, adopt only when score >= 0.3
    ............................... docpact classify.py:117-134, 227-259

Spark-first re-expression: the reference's per-keyword regex *theta*
join (regexp match of each keyword against each header) becomes a
broadcast **inverted-index equi-join** — keyword surface forms
(kw + s/es/ed/ing, the reference's suffix tolerance) are exploded into
a tiny dictionary table that equi-joins the exploded distinct document
tokens. Same result, but the fact-table side stays a scan-local
hash-probe instead of a regex scan, which is the shape that survives
10^12 documents (dictionary is KBs → broadcast; one shuffle on
(doc_id, category) for the score agg, partial map-side).

Propagation joins the unclassified docs' tokens against per-category
profile token sets. Profiles are vocabulary-bounded (|categories| x
|distinct tokens|), so that side is broadcast too; the only large-side
shuffle is the per-doc score aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .base import spread, t
from .dedup import SQL_TOKENS, _tokens

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


# Category keyword dictionary (driver-side literal, broadcast). The
# reference loads these from contract JSON (classify.py keyword config);
# here they are fixed so the DuckDB oracle can embed the same VALUES.
KEYWORDS: dict[str, list[str]] = {
    "storage": ["table", "row", "column", "hash", "sort", "scan", "merge"],
    "query": ["query", "join", "filter", "group", "agg", "window"],
    "stream": ["stream", "batch", "line", "order", "vector"],
}
MIN_SCORE = 5  # best-score gate; below it a doc stays "other"
SUFFIXES = ["", "s", "es", "ed", "ing"]  # classify.py:34-46 tolerance
ADOPT_THRESHOLD = 0.3  # classify.py:258 similarity gate
MIN_DATA_ROWS = 25  # classify.py:200-207 min_data_rows gate (tokens here)

SQL_KEYWORDS = ",\n ".join(
    f"('{cat}','{kw}')" for cat, kws in KEYWORDS.items() for kw in kws
)
_SQL_FORMS_LIST = "[" + ", ".join(
    "kw" if s == "" else f"kw||'{s}'" for s in SUFFIXES
) + "]"


def _kw_forms(spark):
    """(category, kw, form) dictionary with suffix-tolerant surface forms."""
    rows = [
        (cat, kw, kw + s)
        for cat, kws in KEYWORDS.items()
        for kw in kws
        for s in SUFFIXES
    ]
    return spark.createDataFrame(rows, "category string, kw string, form string")


def _doc_tokens(spark, sf):
    """(doc_id, tok) exploded DISTINCT tokens per document."""
    return (
        spread(t(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.explode(F.array_distinct(_tokens())).alias("tok"))
    )


def _scores(spark, sf):
    """(doc_id, category, score): per-category count of matched keywords."""
    tok = _doc_tokens(spark, sf)
    forms = _kw_forms(spark)
    hit = (
        tok.join(F.broadcast(forms), tok["tok"] == forms["form"])
        .select("doc_id", "category", "kw")
        .distinct()
    )
    return hit.groupBy("doc_id", "category").agg(F.count("*").alias("score"))


def _best(spark, sf):
    """Best (category, score) per doc; rows below MIN_SCORE excluded."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("category")
    )
    return (
        _scores(spark, sf)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("score") >= MIN_SCORE))
        .drop("rn")
    )


SQL_CLASSIFY_CTES = f"""
tok AS (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok
        FROM documents),
kw(category, kw) AS (VALUES {SQL_KEYWORDS}),
forms AS (SELECT category, kw, unnest({_SQL_FORMS_LIST}) AS form FROM kw),
hit AS (SELECT DISTINCT t.doc_id, f.category, f.kw
        FROM tok t JOIN forms f ON t.tok = f.form),
score AS (SELECT doc_id, category, count(*) AS score
          FROM hit GROUP BY 1, 2),
best AS (SELECT doc_id, category, score FROM (
           SELECT doc_id, category, score,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, category) AS rn
           FROM score) WHERE rn = 1 AND score >= {MIN_SCORE})
"""


# ---------------------------------------------------------------- c01
@q(
    "c01_keyword_classify",
    oracle=f"""
WITH {SQL_CLASSIFY_CTES}
SELECT d.doc_id,
       coalesce(b.category, 'other') AS category,
       coalesce(b.score, 0) AS score
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
""",
)
def c01(spark, sf):
    """Keyword classification: suffix-tolerant keyword hits per category,
    best score wins (ties by category name), "other" below MIN_SCORE."""
    docs = t(spark, sf, "documents").select("doc_id")
    best = _best(spark, sf)
    return docs.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("category", F.lit("other")).alias("category"),
        F.coalesce("score", F.lit(0).cast("long")).alias("score"),
    )


# ---------------------------------------------------------------- c02
@q(
    "c02_classify_propagate",
    oracle=f"""
WITH {SQL_CLASSIFY_CTES},
ntok AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
ptok AS (SELECT DISTINCT b.category, t.tok
         FROM best b JOIN tok t ON t.doc_id = b.doc_id),
prof AS (SELECT p.category, count(*) AS psize, a.avg_n
         FROM ptok p
         JOIN (SELECT b.category, avg(n.n) AS avg_n
               FROM best b JOIN ntok n ON n.doc_id = b.doc_id
               GROUP BY 1) a ON a.category = p.category
         GROUP BY p.category, a.avg_n),
others AS (SELECT d.doc_id FROM documents d
           LEFT JOIN best b ON d.doc_id = b.doc_id
           WHERE b.doc_id IS NULL),
inter AS (SELECT o.doc_id, p.category, count(*) AS n_inter
          FROM others o
          JOIN tok t ON t.doc_id = o.doc_id
          JOIN ptok p ON p.tok = t.tok
          GROUP BY 1, 2),
sim AS (SELECT i.doc_id, i.category,
               0.5 * (least(n.n, pr.avg_n) / greatest(n.n, pr.avg_n))
             + 0.5 * (CAST(i.n_inter AS DOUBLE)
                      / (n.n + pr.psize - i.n_inter)) AS sim
        FROM inter i
        JOIN ntok n ON n.doc_id = i.doc_id
        JOIN prof pr ON pr.category = i.category),
adopt AS (SELECT doc_id, category, sim FROM (
            SELECT doc_id, category, sim,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY sim DESC, category) AS rn
            FROM sim) WHERE rn = 1 AND sim >= {ADOPT_THRESHOLD})
SELECT o.doc_id,
       coalesce(a.category, 'other') AS category,
       coalesce(a.sim, 0.0) AS sim
FROM others o LEFT JOIN adopt a ON o.doc_id = a.doc_id
""",
)
def c02(spark, sf):
    """Similarity propagation: docs left "other" by c01 adopt the nearest
    classified category — 0.5*size-ratio + 0.5*token-Jaccard vs the
    category's profile (distinct-token union + avg token count), adopted
    only at similarity >= 0.3."""
    tok = _doc_tokens(spark, sf).persist()
    best = _best(spark, sf)
    ntok = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ptok = (
        best.select("doc_id", "category")
        .join(tok, "doc_id")
        .select("category", "tok")
        .distinct()
    )
    avg_n = (
        best.join(ntok, "doc_id")
        .groupBy("category")
        .agg(F.avg("n").alias("avg_n"))
    )
    prof = (
        ptok.groupBy("category")
        .agg(F.count("*").alias("psize"))
        .join(avg_n, "category")
    )
    others = (
        t(spark, sf, "documents")
        .select("doc_id")
        .join(best.select("doc_id"), "doc_id", "left_anti")
    )
    inter = (
        others.join(tok, "doc_id")
        .join(F.broadcast(ptok), "tok")
        .groupBy("doc_id", "category")
        .agg(F.count("*").alias("n_inter"))
    )
    sim = (
        inter.join(ntok, "doc_id")
        .join(F.broadcast(prof), "category")
        .select(
            "doc_id",
            "category",
            (
                0.5 * (F.least("n", "avg_n") / F.greatest("n", "avg_n"))
                + 0.5
                * (
                    F.col("n_inter").cast("double")
                    / (F.col("n") + F.col("psize") - F.col("n_inter"))
                )
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("sim"), F.asc("category"))
    adopt = (
        sim.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("sim") >= ADOPT_THRESHOLD))
        .drop("rn")
    )
    return others.join(adopt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("category", F.lit("other")).alias("category"),
        F.coalesce("sim", F.lit(0.0)).alias("sim"),
    )


# ---------------------------------------------------------------- c03
@q(
    "c03_min_rows_gate",
    oracle=f"""
WITH {SQL_CLASSIFY_CTES}
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_rows,
       CASE WHEN len(string_split(d.text, ' ')) < {MIN_DATA_ROWS}
            THEN 'other' ELSE coalesce(b.category, 'other') END AS category,
       len(string_split(d.text, ' ')) < {MIN_DATA_ROWS} AS gated
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
""",
)
def c03(spark, sf):
    """min_data_rows gate (classify.py:200-207): items with fewer data
    rows than the minimum are forced to 'other' BEFORE keyword scoring —
    a tiny fragment never wins a category even if its few tokens all hit
    keywords. Row-count analogue on the documents table: whitespace
    token count. A pure narrow projection over c01's plan: the gate is a
    CASE on a scan-computable column, so it adds zero shuffles."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_rows")
    )
    best = _best(spark, sf)
    gated = F.col("n_rows") < MIN_DATA_ROWS
    return docs.join(best, "doc_id", "left").select(
        "doc_id",
        "n_rows",
        F.when(gated, F.lit("other"))
        .otherwise(F.coalesce("category", F.lit("other")))
        .alias("category"),
        gated.alias("gated"),
    )
