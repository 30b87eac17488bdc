"""Contract validation as DataFrame filter/assert columns.

The north_star requires the reference's per-document contract validation
(docpact semantics.py:375-448 validate_output, retrieval.py:341-366
required-metadata gating, contracts.py JSON contracts) re-expressed "as
DataFrame filter/assert columns rather than SHACL metadata".  This module
is that re-expression: a contract dict compiles to Column expressions --
one boolean assert column per rule, a violations array, and a keep flag
-- so validation is part of the query plan (Catalyst prunes/pushes it)
instead of a metadata pass.

Rule vocabulary (mirrors the reference's contract JSON):
  valid_values  -- value must be in a closed set  (semantics.py:375-448)
  pattern       -- regexp full-match              (heuristics regex rules)
  min / max     -- numeric range                  (serialize coercion gates)
  not_null      -- required field                 (retrieval.py:341-366)

Scale notes: every rule is a scalar Column expression (JVM-side, no UDF);
valid-value sets ship as literal arrays (broadcast-variable analogue for
expression context); the violations histogram is one explode+groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _rule_ok(col: Column, rule: str, arg) -> Column:
    if rule == "valid_values":
        return col.isin(*arg)
    if rule == "pattern":
        return col.rlike(f"^(?:{arg})$")
    if rule == "min":
        return col.cast("double") >= F.lit(arg)
    if rule == "max":
        return col.cast("double") <= F.lit(arg)
    if rule == "not_null":
        return col.isNotNull() & (F.length(col.cast("string")) > 0)
    raise ValueError(f"unknown rule {rule!r}")


def compile_contract(contract: dict) -> list[tuple[str, Column]]:
    """contract: {field: {rule: arg, ...}, ...} -> [(violation_tag, ok_col)].

    NULL field values pass every rule except not_null (absence is gated
    by not_null only -- matches the reference, where value validation
    skips missing fields)."""
    out = []
    for field, rules in contract.items():
        c = F.col(field)
        for rule, arg in rules.items():
            ok = _rule_ok(c, rule, arg)
            if rule != "not_null":
                ok = ok | c.isNull()
            out.append((f"{field}.{rule}", ok))
    return out


def validate(df: DataFrame, contract: dict, keep_invalid: bool = True) -> DataFrame:
    """Append assert columns: one ``ok_<tag>`` per rule, ``violations``
    (sorted array of failed tags), ``n_violations``, ``valid``.

    ``keep_invalid=False`` filters to valid rows instead (the reference's
    hard-gate mode)."""
    checks = compile_contract(contract)
    out = df
    tags = []
    for tag, ok in checks:
        col_name = "ok_" + tag.replace(".", "_")
        out = out.withColumn(col_name, ok)
        tags.append((tag, col_name))
    viol = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~F.col(cn), F.lit(tag)).otherwise(F.lit(None))
                    for tag, cn in tags
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    out = out.withColumn("violations", viol)
    out = out.withColumn("n_violations", F.size("violations"))
    out = out.withColumn("valid", F.col("n_violations") == 0)
    if not keep_invalid:
        out = out.filter("valid").drop(
            "violations", "n_violations", "valid",
            *[cn for _t, cn in tags],
        )
    return out


def violation_histogram(validated: DataFrame) -> DataFrame:
    """Corpus-level drop-reason metrics: violation tag -> doc count
    (the reference's validation report, as one aggregation)."""
    return (
        validated.select(F.explode("violations").alias("violation"))
        .groupBy("violation")
        .agg(F.count("*").alias("n_docs"))
    )
