"""Header -> canonical-schema mapping as broadcast joins (SURVEY.md §2.3).

Re-expresses the reference's deterministic alias resolution (docpact
interpret.py:1278-1331: normalized hash lookup, ' / '-part matching with
space-joined fallback; normalization interpret.py:987-1004) as DataFrame
joins against a broadcast alias dictionary:

  pass 1  norm(header) equi-join alias            (hash join, broadcast)
  pass 2  unmatched headers split on ' / ', each part joined, a header
          maps iff >= 1 part resolves (part-wise match)
  pass 3  space-joined form of the parts (the reference's fallback when
          no part matched)

Every pass is a broadcast hash equi-join -- the alias dictionary is tiny
(a contract's worth of aliases) while the header stream can be one row
per extracted table column across 10^12 documents.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F


def norm_header(c):
    """Normalization (interpret.py:987-1004 semantics): lower, strip
    double quotes, collapse whitespace, normalize space-before-paren."""
    c = F.lower(c)
    c = F.regexp_replace(c, '"', "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, r"\s*\(", " (")
    return F.trim(c)


NORM_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(lower({x}), "
    "'\"', '', 'g'), '\\s+', ' ', 'g'), '\\s*\\(', ' (', 'g'))"
)


def norm_header_py(s: str) -> str:
    """Driver-side (plain Python) twin of :func:`norm_header` for
    normalizing contract aliases before they ship in a broadcast table.
    The three spellings — Spark expr, DuckDB SQL, Python — live side by
    side HERE so an edit to one is an edit to all; equivalence is
    pinned by tests/test_schema_map.py."""
    s = s.lower().replace('"', "")
    s = re.sub(r"\s+", " ", s)
    s = re.sub(r"\s*\(", " (", s)
    return s.strip()


_YEAR_TMPL = re.compile(r"\{YYYY([+-]\d+)?\}")


def resolve_year_templates(schema: dict, pivot_year: int) -> dict:
    """Driver-side contract prep (docpact contracts.py:192-219 semantics):
    aliases containing ``{YYYY}`` / ``{YYYY±n}`` templates are resolved
    against the document's pivot year before the alias table is built —
    e.g. alias "{YYYY-1} tonnage" with pivot 1996 becomes "1995 tonnage".
    Non-template aliases pass through untouched; the template alias itself
    is replaced (a literal "{YYYY}" never reaches the matcher)."""
    out: dict = {}
    for canonical, aliases in schema.items():
        resolved = []
        for a in aliases:
            if _YEAR_TMPL.search(a):
                def _sub(m):
                    off = int(m.group(1) or 0)
                    return str(pivot_year + off)
                resolved.append(_YEAR_TMPL.sub(_sub, a))
            else:
                resolved.append(a)
        out[canonical] = resolved
    return out


def merge_semantic_aliases(schema: dict, resolved: dict) -> dict:
    """Additive semantic-alias enrichment (docpact pipeline.py:194-202 +
    semantics.py:63-65 semantics): ontology-resolved aliases merge into
    the contract schema case-insensitively — an alias already present in
    any case is skipped, new ones append in resolution order. Driver-side
    contract prep, applied before :func:`alias_table` builds the
    broadcast dictionary (the ontology adapter itself is out of scope —
    the reference resolves it offline into a SemanticContext dict).

    schema/resolved: {canonical: [alias, ...]} -> new merged dict (inputs
    untouched)."""
    out: dict = {}
    for canonical, aliases in schema.items():
        merged = list(aliases)
        seen = {a.lower() for a in merged}
        for alias in resolved.get(canonical, []):
            if alias.lower() not in seen:
                merged.append(alias)
                seen.add(alias.lower())
        out[canonical] = merged
    return out


def coverage_report(mapped: DataFrame, schema: dict) -> DataFrame:
    """Preflight header-coverage report (docpact semantics.py:202-297):
    for every canonical schema column, how many of the document's headers
    resolved to it — including zero-coverage columns (the reference's
    informational "these schema columns have no source header" warning).
    One tiny agg over the map_headers output + a broadcast right side."""
    spark = mapped.sparkSession
    cols = spark.createDataFrame(
        [(c,) for c in schema], "canonical string"
    )
    counts = (
        mapped.filter(F.col("canonical").isNotNull())
        .groupBy("canonical")
        .agg(F.count("*").alias("n_headers"))
    )
    # broadcast the aggregated (build) side: Spark cannot build the
    # PRESERVED side of a left-outer join, so hinting `cols` would be
    # silently ignored (HintErrorLogger warnings)
    return (
        cols
        .join(F.broadcast(counts), "canonical", "left")
        .select(
            "canonical",
            F.coalesce("n_headers", F.lit(0).cast("long")).alias("n_headers"),
            (F.coalesce("n_headers", F.lit(0)) > 0).alias("covered"),
        )
    )


def alias_table(spark: SparkSession, schema: dict) -> DataFrame:
    """schema: {canonical: [alias, ...]} -> (canonical, norm_alias) rows.
    The canonical name itself is always an alias."""
    rows = []
    for canonical, aliases in schema.items():
        for a in {canonical, *aliases}:
            rows.append((canonical, a))
    df = spark.createDataFrame(rows, "canonical string, alias string")
    return df.select(
        "canonical", norm_header(F.col("alias")).alias("norm_alias")
    ).distinct()


def map_headers(headers: DataFrame, aliases: DataFrame) -> DataFrame:
    """headers(header) -> (header, canonical, match_via).

    match_via in {'direct', 'part', 'joined', null}; unmatched headers
    survive with canonical = null (the reference hands those to its LLM
    fallback -- out of the deterministic path, so they stay unmapped).
    """
    al = F.broadcast(aliases)
    h = headers.select(
        "header", norm_header(F.col("header")).alias("norm")
    ).distinct()

    direct = h.join(al, h.norm == al.norm_alias, "left").select(
        "header",
        "norm",
        F.col("canonical").alias("c1"),
    )

    un1 = direct.filter(F.col("c1").isNull()).select("header", "norm")
    parts = un1.select(
        "header",
        F.posexplode(F.split("norm", r" / ")).alias("pi", "part"),
    )
    part_hit = (
        parts.join(al, parts.part == al.norm_alias, "left")
        .filter(F.col("canonical").isNotNull())
        .groupBy("header")
        .agg(F.min_by("canonical", "pi").alias("c2"))
    )

    un2 = un1.join(part_hit, "header", "left_anti").select("header", "norm")
    joined = un2.select(
        "header", F.regexp_replace("norm", r" / ", " ").alias("jn")
    )
    joined_hit = (
        joined.join(al, joined.jn == al.norm_alias, "left")
        .filter(F.col("canonical").isNotNull())
        .select("header", F.col("canonical").alias("c3"))
    )

    out = (
        direct.select("header", "c1")
        .join(part_hit, "header", "left")
        .join(joined_hit, "header", "left")
    )
    return out.select(
        "header",
        F.coalesce("c1", "c2", "c3").alias("canonical"),
        F.when(F.col("c1").isNotNull(), "direct")
        .when(F.col("c2").isNotNull(), "part")
        .when(F.col("c3").isNotNull(), "joined")
        .alias("match_via"),
    )


def match_title_dims(
    titles: DataFrame, aliases: DataFrame, dim_cols: set[str]
) -> DataFrame:
    """Title -> constant-dimension match (docpact interpret.py:1388-1424
    semantics): a table title that matches a DIMENSION-type schema
    column's alias assigns that column as a constant dimension for every
    record (e.g. title "RICE" matching Crop alias "rice" -> Crop="RICE").
    Exact normalized match first; when it yields nothing, the fallback
    accepts an alias (>= 3 chars) appearing as a word-boundary substring
    of the title. BOTH passes require exactly one candidate column —
    ambiguity means no match (the reference's len == 1 gates).

    titles(title) -> (title, canonical, match_via) with match_via in
    {'title', 'substring', null}. The alias side is a contract's worth
    of rows (KBs -> broadcast); the substring pass is a LIKE-predicate
    broadcast nested-loop against that tiny dictionary only — the big
    title stream is never self-joined. Word boundaries are space
    boundaries post-normalization (the reference's \\b over its
    normalized form)."""
    dims = aliases.filter(F.col("canonical").isin(list(dim_cols)))
    n = titles.select(
        "title", norm_header(F.col("title")).alias("norm")
    ).distinct()
    exact = (
        n.join(F.broadcast(dims), n["norm"] == dims["norm_alias"])
        .groupBy("title")
        .agg(F.array_sort(F.collect_set("canonical")).alias("ec"))
    )
    subs = (
        n.join(
            F.broadcast(dims.filter(F.length("norm_alias") >= 3)),
            F.expr(
                "concat(' ', norm, ' ') LIKE concat('% ', norm_alias, ' %')"
            ),
        )
        .groupBy("title")
        .agg(F.array_sort(F.collect_set("canonical")).alias("sc"))
    )
    return (
        titles.join(exact, "title", "left")
        .join(subs, "title", "left")
        .select(
            "title",
            F.when(F.size("ec") == 1, F.col("ec")[0])
            .when(F.col("ec").isNull() & (F.size("sc") == 1), F.col("sc")[0])
            .alias("canonical"),
            F.when(F.size("ec") == 1, F.lit("title"))
            .when(
                F.col("ec").isNull() & (F.size("sc") == 1), F.lit("substring")
            )
            .alias("match_via"),
        )
    )
