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


# ------------------------------------------------------------------ f02
# FH5 text-color semantics (compress.py:740-777: red/orange = exception,
# header color = most frequent color in the header zone) + the VH6
# cross-validation verdict (compress.py:386-419: a row carrying the
# header color whose cells nevertheless type as DATA is an "exception
# highlight", not an extra header row).
#
# Color grid derived like f01's style grid: every cell gets a
# deterministic rgb() string — header rows one uniform per-doc color,
# every 7th doc's FIRST DATA ROW painted with that same header color
# (the VH6 injection), body cells position-dependent. Cell text types
# header rows as words and data rows as digits, so the reference's
# type-pattern arbiter is computable. Exception rule applied exactly as
# the reference states it on 0-1 floats: r>0.6 AND g<0.5 AND b<0.3.

_F02_COLOR_SQL = (
    "CASE WHEN r < {H} OR (r = {H} AND doc_id % 7 = 0)"
    " THEN 'rgb(' || CAST(doc_id % 120 AS VARCHAR) || ', 30, 40)'"
    " ELSE 'rgb(' || CAST((k * 37) % 256 AS VARCHAR) || ', '"
    "      || CAST((k * 59) % 256 AS VARCHAR) || ', '"
    "      || CAST((k * 83) % 256 AS VARCHAR) || ')' END"
)

_F02_ORACLE = f"""
WITH base AS (
  SELECT doc_id, r, c, cstr,
         regexp_extract(cstr, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 1)::INT AS cr,
         regexp_extract(cstr, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 2)::INT AS cg,
         regexp_extract(cstr, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 3)::INT AS cb,
         CASE WHEN r < {HEADER_ROWS} THEN 'h' || CAST(c AS VARCHAR)
              ELSE CAST(pos AS VARCHAR) END AS txt
  FROM (
    SELECT doc_id, pos, pos // 4 AS r, pos % 4 AS c,
           doc_id * 131 + pos AS k,
           {_F02_COLOR_SQL.format(H=HEADER_ROWS).replace('{{', '{').replace('}}', '}').replace('r <', '(pos // 4) <').replace('(r =', '((pos // 4) =')} AS cstr
    FROM (
      SELECT doc_id, g.pos
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           LATERAL unnest(generate_series(0, len(ws) - 1)) AS g(pos)
    )
  )
),
rowg AS (
  SELECT doc_id, r,
         min(cstr) AS row_color,
         (min(cstr) = max(cstr)) AS uniform,
         CAST(count(*) FILTER (regexp_matches(txt, '^[0-9]+$')) AS DOUBLE)
           / count(*) AS numeric_frac
  FROM base GROUP BY 1, 2
),
hdr AS (
  SELECT doc_id, min(row_color) AS header_color
  FROM rowg WHERE r < {HEADER_ROWS} GROUP BY 1
),
vis AS (
  SELECT r.doc_id,
         CAST(count(*) FILTER (r.uniform AND r.row_color = h.header_color)
              AS BIGINT) AS visual_hdr_rows,
         CAST(count(*) FILTER (r.numeric_frac < 0.5) AS BIGINT)
           AS text_hdr_rows
  FROM rowg r JOIN hdr h ON h.doc_id = r.doc_id
  GROUP BY 1
),
disputed AS (
  SELECT v.doc_id, v.visual_hdr_rows, v.text_hdr_rows, g.numeric_frac
  FROM vis v
  LEFT JOIN rowg g ON g.doc_id = v.doc_id AND g.r = v.text_hdr_rows
),
exc AS (
  SELECT doc_id,
         CAST(count(DISTINCT cstr) FILTER (
           cr / 255.0 > 0.6 AND cg / 255.0 < 0.5 AND cb / 255.0 < 0.3
           AND NOT (cr = 255 AND cg = 255 AND cb = 255)
         ) AS BIGINT) AS n_exception_colors,
         CAST(count(*) FILTER (
           cr / 255.0 > 0.6 AND cg / 255.0 < 0.5 AND cb / 255.0 < 0.3
           AND NOT (cr = 255 AND cg = 255 AND cb = 255)
         ) AS BIGINT) AS n_exception_cells
  FROM base GROUP BY 1
)
SELECT h.doc_id, h.header_color,
       d.visual_hdr_rows, d.text_hdr_rows,
       CASE
         WHEN d.visual_hdr_rows = d.text_hdr_rows THEN 'match'
         WHEN d.visual_hdr_rows > d.text_hdr_rows
              AND d.numeric_frac >= 0.5 THEN 'vh6_exception'
         ELSE 'contradiction'
       END AS vh6_verdict,
       e.n_exception_colors, e.n_exception_cells
FROM hdr h
JOIN disputed d ON d.doc_id = h.doc_id
JOIN exc e ON e.doc_id = h.doc_id
"""


def f02_color_semantics(spark, sf):
    """FH5 color semantics + VH6 exception-highlight cross-validation
    (reference rules cited in the block comment above). Per doc:
    header text color (mode of the header zone — computed as min over
    the uniform header rows), distinct/total exception-colored cells
    (red/orange: r>0.6, g<0.5, b<0.3 on 0-1 floats), visual vs
    text-typed header row counts, and the VH6 verdict ('match' /
    'vh6_exception' / 'contradiction').

    Plan shape: posexplode -> cell colors parsed by the Catalyst-only
    functions.parse_css_color -> one row-grain partial agg + one
    doc-grain cell agg -> doc-grain join. Two narrow shuffles, no UDFs,
    same scale envelope as f01."""
    from .. import functions as FN

    docs = t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    grid = docs.select(
        "doc_id", F.posexplode("words").alias("pos", "w")
    ).select(
        "doc_id",
        "pos",
        F.expr("pos div 4").alias("r"),
        (F.col("pos") % 4).alias("c"),
        F.expr("doc_id * 131 + pos").alias("k"),
    )
    h = HEADER_ROWS
    cstr = F.expr(
        f"CASE WHEN r < {h} OR (r = {h} AND doc_id % 7 = 0)"
        " THEN concat('rgb(', CAST(doc_id % 120 AS STRING), ', 30, 40)')"
        " ELSE concat('rgb(', CAST((k * 37) % 256 AS STRING), ', ',"
        " CAST((k * 59) % 256 AS STRING), ', ',"
        " CAST((k * 83) % 256 AS STRING), ')') END"
    )
    txt = F.when(
        F.col("r") < h, F.concat(F.lit("h"), F.col("c").cast("string"))
    ).otherwise(F.col("pos").cast("string"))
    base = grid.select(
        "doc_id",
        "r",
        cstr.alias("cstr"),
        FN.parse_css_color(cstr).alias("col"),
        txt.alias("txt"),
    )
    rowg = base.groupBy("doc_id", "r").agg(
        F.min("cstr").alias("row_color"),
        (F.min("cstr") == F.max("cstr")).alias("uniform"),
        (
            F.count_if(F.col("txt").rlike("^[0-9]+$")).cast("double")
            / F.count("*")
        ).alias("numeric_frac"),
    )
    hdr = (
        rowg.filter(F.col("r") < h)
        .groupBy("doc_id")
        .agg(F.min("row_color").alias("header_color"))
    )
    vis = (
        rowg.join(hdr, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count_if(
                F.col("uniform") & (F.col("row_color") == F.col("header_color"))
            ).alias("visual_hdr_rows"),
            F.count_if(F.col("numeric_frac") < 0.5).alias("text_hdr_rows"),
        )
    )
    rg = rowg.select("doc_id", "r", "numeric_frac").alias("rg")
    v = vis.alias("v")
    disputed = v.join(
        rg,
        (F.col("v.doc_id") == F.col("rg.doc_id"))
        & (F.col("rg.r") == F.col("v.text_hdr_rows")),
        "left",
    ).select(
        F.col("v.doc_id").alias("doc_id"),
        "visual_hdr_rows",
        "text_hdr_rows",
        "numeric_frac",
    )
    is_exc = (
        (F.col("col.r") / 255.0 > 0.6)
        & (F.col("col.g") / 255.0 < 0.5)
        & (F.col("col.b") / 255.0 < 0.3)
    )
    exc = base.groupBy("doc_id").agg(
        F.count_distinct(F.when(is_exc, F.col("cstr"))).alias(
            "n_exception_colors"
        ),
        F.count_if(is_exc).alias("n_exception_cells"),
    )
    verdict = (
        F.when(
            F.col("visual_hdr_rows") == F.col("text_hdr_rows"), "match"
        )
        .when(
            (F.col("visual_hdr_rows") > F.col("text_hdr_rows"))
            & (F.col("numeric_frac") >= 0.5),
            "vh6_exception",
        )
        .otherwise("contradiction")
    )
    return (
        hdr.join(disputed, "doc_id")
        .join(exc, "doc_id")
        .select(
            "doc_id",
            "header_color",
            "visual_hdr_rows",
            "text_hdr_rows",
            verdict.alias("vh6_verdict"),
            "n_exception_colors",
            "n_exception_cells",
        )
    )


QUERIES["f02_color_semantics"] = f02_color_semantics
ORACLE["f02_color_semantics"] = _F02_ORACLE
