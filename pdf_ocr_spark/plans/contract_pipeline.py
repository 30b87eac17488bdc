"""End-to-end contract pipeline: the reference user's switch path.

docpact's ``run_pipeline(contract, docs) -> validated tables`` becomes
one Spark job chaining this engine's stages:

  1. extract       interleaved spans -> ordered content spans + metrics
                   (extract/pipeline.py — layout, boilerplate, grids)
  2. map headers   heading spans -> canonical schema columns via the
                   broadcast alias joins (operators/schema_map.py)
  3. validate      contract rules as assert columns + violation
                   histogram (operators/validation.py)
  4. write         validated long-form records + metrics tables

Contract dict shape (the reference's JSON contract, simplified):

    {"schema": {canonical: [alias, ...]},
     "rules":  {canonical: {rule: arg, ...}}}

Output tables under ``out_dir``:
    records/   (doc_id, span_idx, canonical, value, valid, violations_csv)
    metrics/   per-document extraction metrics
    report/    violation histogram (violation, n_docs)

Everything between the extraction UDF and the sink is stock DataFrame
API — Catalyst owns the plan; at 10^12 docs the only Python is the
extraction kernels themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..extract.pipeline import extract
from ..operators.schema_map import alias_table, map_headers
from ..operators.validation import validate, violation_histogram


def _mapped_cells(spark, extracted: DataFrame, schema: dict) -> DataFrame:
    """Ordered spans -> long-form (doc_id, span_idx, canonical, value).

    Column association is positional, reconstructed from reading order:
    consecutive heading spans form a header block of k columns; the
    cells that follow cycle through those k columns row-major
    (cell_seq mod k).  All window functions — no Python.  Headings
    resolve to canonical columns via the broadcast alias joins.
    """
    spans = extracted.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "s")
    ).select(
        "doc_id",
        "span_idx",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
    )

    order = W.partitionBy("doc_id").orderBy("span_idx")
    is_hdr = (F.col("kind") == "heading").cast("int")
    prev_hdr = F.coalesce(F.lag(is_hdr).over(order), F.lit(0))
    # a block starts at each heading run; cells attach to the latest block
    spans = spans.withColumn(
        "block",
        F.sum(
            F.when((is_hdr == 1) & (prev_hdr == 0), 1).otherwise(0)
        ).over(order.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )

    blk = W.partitionBy("doc_id", "block")
    hdrs = (
        spans.filter(F.col("kind") == "heading")
        .withColumn(
            "col_idx",
            F.row_number().over(blk.orderBy("span_idx")) - 1,
        )
        .select("doc_id", "block", "col_idx", F.col("text").alias("header"))
    )
    k = hdrs.groupBy("doc_id", "block").agg(F.count("*").alias("k"))

    cells = (
        spans.filter(F.col("kind") == "cell")
        .withColumn(
            "cell_seq", F.row_number().over(blk.orderBy("span_idx")) - 1
        )
        .join(k, ["doc_id", "block"], "left")
        .withColumn("col_idx", F.pmod("cell_seq", F.coalesce("k", F.lit(1))))
    )

    mapping = map_headers(
        hdrs.select("header").distinct(), alias_table(spark, schema)
    )
    return (
        cells.join(hdrs, ["doc_id", "block", "col_idx"], "left")
        .join(F.broadcast(mapping), "header", "left")
        .select(
            "doc_id", "span_idx", "canonical", F.col("text").alias("value")
        )
    )


def _validated_records(cells: DataFrame, rules: dict) -> DataFrame:
    """Apply each canonical column's rule set to its rows; rows of
    unruled columns are valid by definition."""
    no_viol = F.lit([]).cast("array<string>")
    if not rules:
        return cells.select(
            "doc_id", "span_idx", "canonical", "value",
            F.lit(True).alias("valid"), F.lit("").alias("violations_csv"),
        )
    parts = []
    for canonical, rr in rules.items():
        part = (
            cells.filter(F.col("canonical") == canonical)
            .withColumn(canonical, F.col("value"))
        )
        parts.append(
            validate(part, {canonical: rr}).select(
                "doc_id", "span_idx", "canonical", "value",
                "valid", F.array_join("violations", ",").alias("violations_csv"),
            )
        )
    rest = cells.filter(
        F.col("canonical").isNull() | ~F.col("canonical").isin(*rules)
    ).select(
        "doc_id", "span_idx", "canonical", "value",
        F.lit(True).alias("valid"), F.lit("").alias("violations_csv"),
    )
    out = rest
    for p in parts:
        out = out.unionByName(p)
    return out


def run_contract_pipeline(
    spark: SparkSession,
    contract: dict,
    input_df: DataFrame,
    out_dir: str | None = None,
    salt_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Run extract -> map -> validate; optionally write the three output
    tables. Returns {"records", "metrics", "report"} DataFrames."""
    extracted = extract(input_df, salt_partitions=salt_partitions)
    cells = _mapped_cells(spark, extracted, contract["schema"])
    records = _validated_records(cells, contract.get("rules", {}))

    metrics = extracted.select("doc_id", "metrics.*")
    report = violation_histogram(
        records.select(
            F.filter(
                F.split("violations_csv", ","), lambda x: x != ""
            ).alias("violations")
        )
    )

    out = {"records": records, "metrics": metrics, "report": report}
    if out_dir:
        for name, df in out.items():
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
    return out
