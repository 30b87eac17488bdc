"""Composed metadata-field retrieval (docpact retrieval.py:166-340).

Re-expresses the reference's ``quick_scan`` + fallback chain as one
declarative operator over a zone-text relation: each field definition
carries an ordered zone list, optional custom regex patterns, an
optional built-in pattern CATEGORY (RH1 temporal / RH4 unit-currency,
heuristics.py:442-562), and a fallback strategy. Resolution order is
the reference's exactly (retrieval.py:269-320): zones in order, pages
in order within a zone, custom patterns before category patterns
within a page, pattern-list order last; the first match wins.
Confidence: 0.9 custom, 0.7 category, 0.5 fallback default, 0.0
missing/flagged (retrieval.py:300-334 + 393-430 apply_fallbacks).

Scale shape: one union of scan-local regexp filter branches (literal
patterns — no per-row Python, no column-pattern regex), one min_by
aggregation per (doc, field) keyed by the precedence vector, and a
broadcast doc x field spine for the fallback rows. The zone-text input
is the z01 zone operator's output shape (doc_id, page, zone,
zone_text), so zone pulls never touch the full extraction path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Built-in category pattern families (docpact heuristics.py:442-506 RH1,
# 514-562 RH4) — single capture group per pattern so Spark (Java regex)
# and DuckDB (RE2) extract identically; order is the reference's scan
# order within a category.
CATEGORY_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "temporal": [
        ("as_of_date", r"[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})"),
        (
            "period_end",
            r"[Ff]or the (?:year|period|quarter) ended?"
            r" ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})",
        ),
        ("quarter", r"\b(Q[1-4] ?(?:FY)?[0-9]{2,4})"),
        ("fiscal_year", r"\bFY ?([0-9]{2,4})"),
    ],
    "table_context": [
        ("unit_scale", r"\(in (thousands|millions|billions)\)"),
        ("currency_code", r"\b(USD|EUR|GBP|AUD)\b"),
        ("tonnage", r"([0-9,]+(?:\.[0-9]+)?) ?MT\b"),
    ],
}

MAX_SCAN_PAGES = 3  # retrieval.py:254 "default: first 3 pages"


def field_pattern_plan(fields: list[dict]) -> list[dict]:
    """Flatten field definitions into ordered scan branches: one row per
    (field, zone, pattern) with the precedence vector (zone_rank,
    is_category, pattern_rank) and the match confidence."""
    plan = []
    for f in fields:
        zones = f.get("zones") or ["anywhere"]
        for zr, zone in enumerate(zones):
            for pr, rx in enumerate(f.get("patterns") or []):
                plan.append(
                    {
                        "field": f["name"], "zone": zone, "zone_rank": zr,
                        "is_category": 0, "pattern_rank": pr, "rx": rx,
                        "pattern": rx, "confidence": 0.9,
                    }
                )
            cat = f.get("category")
            for pr, (pname, rx) in enumerate(CATEGORY_PATTERNS.get(cat, [])):
                plan.append(
                    {
                        "field": f["name"], "zone": zone, "zone_rank": zr,
                        "is_category": 1, "pattern_rank": pr, "rx": rx,
                        "pattern": pname, "confidence": 0.7,
                    }
                )
    return plan


def quick_scan(
    zone_texts: DataFrame, fields: list[dict],
    max_pages: int = MAX_SCAN_PAGES,
) -> DataFrame:
    """zone_texts(doc_id, page, zone, zone_text) + field definitions ->
    (doc_id, field, value, source_zone, confidence, pattern): one row
    per (document x field), first match by the reference's precedence,
    fallbacks applied for misses (fallback 'default' -> the field's
    default at confidence 0.5; anything else -> null at 0.0)."""
    zt = zone_texts.filter(F.col("page") < max_pages)
    branches = []
    for b in field_pattern_plan(fields):
        branches.append(
            zt.filter(F.col("zone") == b["zone"])
            .filter(F.col("zone_text").rlike(b["rx"]))
            .select(
                "doc_id",
                F.lit(b["field"]).alias("field"),
                F.regexp_extract("zone_text", b["rx"], 1).alias("value"),
                F.col("zone").alias("source_zone"),
                F.lit(b["confidence"]).alias("confidence"),
                F.lit(b["pattern"]).alias("pattern"),
                F.struct(
                    F.lit(b["zone_rank"]).alias("zr"),
                    F.col("page").alias("pg"),
                    F.lit(b["is_category"]).alias("ic"),
                    F.lit(b["pattern_rank"]).alias("pr"),
                ).alias("prec"),
            )
        )
    spark = zone_texts.sparkSession
    fdf = spark.createDataFrame(
        [
            (
                f["name"],
                (f.get("zones") or ["anywhere"])[0],
                str(f["default"])
                if f.get("fallback") == "default" and f.get("default") is not None
                else None,
            )
            for f in fields
        ],
        "field string, first_zone string, default_value string",
    )
    spine = zone_texts.select("doc_id").distinct().crossJoin(F.broadcast(fdf))
    if branches:
        cand = branches[0]
        for b in branches[1:]:
            cand = cand.unionByName(b)
        best = cand.groupBy("doc_id", "field").agg(
            F.min_by(
                F.struct("value", "source_zone", "confidence", "pattern"),
                F.col("prec"),
            ).alias("b")
        )
        joined = spine.join(best, ["doc_id", "field"], "left")
    else:
        joined = spine.withColumn(
            "b",
            F.lit(None).cast(
                "struct<value:string,source_zone:string,"
                "confidence:double,pattern:string>"
            ),
        )
    found = F.col("b").isNotNull()
    has_default = F.col("default_value").isNotNull()
    return joined.select(
        "doc_id",
        "field",
        F.when(found, F.col("b.value"))
        .when(has_default, F.col("default_value"))
        .alias("value"),
        # misses report the field's first search zone, like the
        # reference's RetrievedMetadata (retrieval.py:327-334; fallback
        # rows use ANYWHERE, 416-423 — we keep the first zone, a
        # documented simplification pinned by the oracle)
        F.coalesce(F.col("b.source_zone"), F.col("first_zone")).alias(
            "source_zone"
        ),
        F.when(found, F.col("b.confidence"))
        .when(has_default, F.lit(0.5))
        .otherwise(F.lit(0.0))
        .alias("confidence"),
        F.col("b.pattern").alias("pattern"),
    )


def missing_required(scan: DataFrame, fields: list[dict]) -> DataFrame:
    """Phase-2 required-field gate (retrieval.py:340-366
    validate_metadata): (doc_id, missing array, passed). A field counts
    as missing when required and its resolved value is null (a
    fallback default satisfies the gate, like the reference's
    apply_fallbacks feeding the final dict)."""
    req = [f["name"] for f in fields if f.get("required")]
    spark = scan.sparkSession
    rdf = spark.createDataFrame([(n,) for n in req], "field string")
    miss = (
        scan.join(F.broadcast(rdf), "field")
        .filter(F.col("value").isNull())
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("field")).alias("missing"))
    )
    docs = scan.select("doc_id").distinct()
    return docs.join(miss, "doc_id", "left").select(
        "doc_id",
        F.coalesce("missing", F.array().cast("array<string>")).alias("missing"),
        (F.coalesce(F.size("missing"), F.lit(0)) == 0).alias("passed"),
    )
