"""Font / visual evidence profiles as relational plans (FH2-FH4, VH3).

Reference semantics (NOT code): docpact's parallel font channel —
bold-header contrast FH2 (compress.py:600-646), italic metadata rows
FH3 (compress.py:651-693), monospace columns FH4 (compress.py:696-737)
— and the visual zebra detector VH3 (compress.py:232-292), which the
reference runs per page as cross-validation evidence next to the text
heuristics.

Spark-first re-expression: a styled span grid is DERIVED from the
``documents`` table with pure column ops (the x01 trick: words laid out
on a 4-column grid, style flags a deterministic function of
(doc_id, row, col)), then every heuristic is a plain aggregation:

  - FH2 is two conditional sums per doc (header zone = rows < 2, the
    reference's default header_row_estimate, compress.py:2264);
  - FH3/row-bold counts are a row-grain partial agg rolled up per doc;
  - FH4 is a col-grain agg over data rows;
  - VH3 alternation counting is ONE lag window over the row-grain agg
    (row counts per doc are tiny after the partial agg — the window's
    per-doc partition is bounded, no skew).

All partial-aggregatable, no UDFs — at 10^12 docs the plan is scan →
two narrow shuffles (row/col grain) → doc-grain rollup joins.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .base import t

QUERIES = {}
ORACLE = {}

HEADER_ROWS = 2  # reference default header_row_estimate (compress.py:2264)


def _base(spark, sf):
    """(doc_id, nw, r, c, bold, italic, mono, fill) styled span grid
    derived from documents.text: word pos -> row = pos div 4,
    col = pos % 4; flags deterministic in (doc_id, row, col)."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    return (
        docs.select(
            "doc_id",
            F.size("words").alias("nw"),
            F.posexplode("words").alias("pos", "w"),
        )
        .select(
            "doc_id",
            "nw",
            F.expr("pos div 4").alias("r"),
            (F.col("pos") % 4).alias("c"),
        )
        .select(
            "doc_id",
            "nw",
            "r",
            "c",
            ((F.col("r") < HEADER_ROWS) & (F.col("doc_id") % 2 == 0)).alias(
                "bold"
            ),
            (
                (F.col("r") == F.expr("(nw - 1) div 4"))
                & (F.col("doc_id") % 3 == 0)
            ).alias("italic"),
            ((F.col("c") == 1) & (F.col("doc_id") % 2 == 1)).alias("mono"),
            F.when(F.col("doc_id") % 5 < 4, F.col("r") % 2).alias("fill"),
        )
    )


_F01_ORACLE = f"""
WITH base AS (
  SELECT doc_id, nw, pos // 4 AS r, pos % 4 AS c,
         (pos // 4 < {HEADER_ROWS} AND doc_id % 2 = 0) AS bold,
         (pos // 4 = (nw - 1) // 4 AND doc_id % 3 = 0) AS italic,
         (pos % 4 = 1 AND doc_id % 2 = 1) AS mono,
         CASE WHEN doc_id % 5 < 4 THEN (pos // 4) % 2 END AS fill
  FROM (
    SELECT doc_id, len(ws) AS nw, g.pos
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         LATERAL unnest(generate_series(0, len(ws) - 1)) AS g(pos)
  )
),
rowg AS (
  SELECT doc_id, r,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (bold) AS BIGINT) AS nb,
         CAST(count(*) FILTER (italic) AS BIGINT) AS ni,
         min(fill) AS fill,
         min(nw) AS nw
  FROM base GROUP BY 1, 2
),
doca AS (
  SELECT doc_id,
         CAST(sum(nb) FILTER (r < {HEADER_ROWS}) AS DOUBLE)
           / sum(n) FILTER (r < {HEADER_ROWS}) AS header_bold_ratio,
         CAST(sum(nb) FILTER (r >= {HEADER_ROWS}) AS DOUBLE)
           / sum(n) FILTER (r >= {HEADER_ROWS}) AS data_bold_ratio,
         CAST(count(*) FILTER (nb > 0.5 * n) AS BIGINT) AS n_bold_hdr_rows,
         CAST(count(*) FILTER (ni > 0.8 * n) AS BIGINT) AS n_meta_rows
  FROM rowg GROUP BY 1
),
colg AS (
  SELECT doc_id, c, count(*) AS n, count(*) FILTER (mono) AS nm
  FROM base WHERE r >= {HEADER_ROWS} GROUP BY 1, 2
),
docc AS (
  SELECT doc_id,
         CAST(count(*) FILTER (nm > 0.5 * n) AS BIGINT) AS n_mono_cols
  FROM colg GROUP BY 1
),
rowz AS (
  SELECT doc_id, r, fill,
         lag(fill) OVER (PARTITION BY doc_id ORDER BY r) AS prev_fill
  FROM rowg
  WHERE r >= least(3, ((nw + 3) // 4) // 4)
),
docz AS (
  SELECT doc_id,
         CAST(count(*) FILTER (
           fill IS NOT NULL AND prev_fill IS NOT NULL
           AND fill <> prev_fill) AS BIGINT) AS zebra_alt,
         CAST(count(DISTINCT fill) AS BIGINT) AS n_fill_colors
  FROM rowz GROUP BY 1
)
SELECT a.doc_id, a.header_bold_ratio, a.data_bold_ratio,
       a.n_bold_hdr_rows, a.n_meta_rows, c.n_mono_cols,
       z.zebra_alt, (z.zebra_alt >= 4 AND z.n_fill_colors = 2) AS is_zebra
FROM doca a
JOIN docc c ON c.doc_id = a.doc_id
JOIN docz z ON z.doc_id = a.doc_id
"""


def f01_font_profile(spark, sf):
    """Per-document font/visual evidence profile: FH2 bold header/data
    contrast ratios + bold-majority row count, FH3 italic metadata-row
    count, FH4 monospace data-column count, VH3 zebra alternation count
    and verdict (>= 4 alternations between exactly 2 fill colors,
    counted from the reference's start_check = min(3, n_rows // 4))."""
    base = _base(spark, sf)
    rowg = base.groupBy("doc_id", "r").agg(
        F.count("*").alias("n"),
        F.count_if("bold").alias("nb"),
        F.count_if("italic").alias("ni"),
        F.min("fill").alias("fill"),
        F.min("nw").alias("nw"),
    )
    doca = rowg.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("r") < HEADER_ROWS, F.col("nb"))).cast("double")
            / F.sum(F.when(F.col("r") < HEADER_ROWS, F.col("n")))
        ).alias("header_bold_ratio"),
        (
            F.sum(F.when(F.col("r") >= HEADER_ROWS, F.col("nb"))).cast(
                "double"
            )
            / F.sum(F.when(F.col("r") >= HEADER_ROWS, F.col("n")))
        ).alias("data_bold_ratio"),
        F.count_if(F.col("nb") > 0.5 * F.col("n")).alias("n_bold_hdr_rows"),
        F.count_if(F.col("ni") > 0.8 * F.col("n")).alias("n_meta_rows"),
    )
    colg = (
        base.filter(F.col("r") >= HEADER_ROWS)
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("n"), F.count_if("mono").alias("nm"))
    )
    docc = colg.groupBy("doc_id").agg(
        F.count_if(F.col("nm") > 0.5 * F.col("n")).alias("n_mono_cols")
    )
    w = Window.partitionBy("doc_id").orderBy("r")
    rowz = rowg.filter(
        F.col("r") >= F.least(F.lit(3), F.expr("((nw + 3) div 4) div 4"))
    ).withColumn("prev_fill", F.lag("fill").over(w))
    docz = rowz.groupBy("doc_id").agg(
        F.count_if(
            F.col("fill").isNotNull()
            & F.col("prev_fill").isNotNull()
            & (F.col("fill") != F.col("prev_fill"))
        ).alias("zebra_alt"),
        F.countDistinct("fill").alias("n_fill_colors"),
    )
    return (
        doca.join(docc, "doc_id")
        .join(docz, "doc_id")
        .select(
            "doc_id",
            "header_bold_ratio",
            "data_bold_ratio",
            "n_bold_hdr_rows",
            "n_meta_rows",
            "n_mono_cols",
            "zebra_alt",
            ((F.col("zebra_alt") >= 4) & (F.col("n_fill_colors") == 2)).alias(
                "is_zebra"
            ),
        )
    )


QUERIES["f01_font_profile"] = f01_font_profile
ORACLE["f01_font_profile"] = _F01_ORACLE
