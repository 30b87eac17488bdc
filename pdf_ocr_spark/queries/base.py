"""Shared helpers for the query library.

Cross-engine determinism rules (Spark result must value-hash-equal the
DuckDB oracle):
  - SUM/AVG over doubles is order-dependent → aggregate DECIMAL(18,4)
    casts (exact, associative) and cast the final value to DOUBLE.
  - every top-k is ordered by a unique tie-break key;
  - timestamps are compared as-is (session TZ pinned to UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col, scale: int = 4):
    """Order-independent exact sum of a double column, surfaced as double."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


def dsum_expr(expr, scale: int = 6):
    """Exact sum of a computed double expression (cast per-row first)."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double")


# SQL-side twins (DuckDB oracle snippets)
def sql_dsum(col: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_dsum_expr(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
