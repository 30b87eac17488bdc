"""Tabular sinks: CSV / TSV / Parquet writers (docpact serialize.py
semantics at the DataFrame level).

Reference parity (NOT a port): to_csv serialize.py:604-640, to_tsv
643-681, to_parquet 684-750. The reference serializes per-document
pandas frames; here the same record tables are written once, partitioned
and distributed — header handling, delimiter, and null representation
mirror the reference's csv.DictWriter defaults (empty string for null).

Scale notes: writers are the terminal exchange-free stage of whatever
plan feeds them; `partitionBy` columns turn into directory partitions
(partition pruning for readers), and `maxRecordsPerFile` bounds file
sizes so a 10^12-row write never produces unsplittable giants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    w = (
        df.write.mode("overwrite")
        .option("header", True)
        .option("sep", sep)
        .option("emptyValue", "")  # serialize.py: nulls -> empty cells
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_tsv(df: DataFrame, path: str, **kw) -> None:
    write_csv(df, path, sep="\t", **kw)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def to_pandas(df: DataFrame):
    """Driver-side pandas frame (docpact serialize.py:753-811 analogue).
    Debug/small-result use only — a collect; never call on a 10^12-row
    table. Arrow-accelerated when spark.sql.execution.arrow.pyspark is
    enabled (the session default here)."""
    return df.toPandas()


def to_polars(df: DataFrame):
    """Driver-side polars frame (docpact serialize.py:814-876 analogue),
    via the Arrow interchange (zero-copy from the pandas/Arrow batch).
    Gated on polars being installed; same collect caveat as to_pandas."""
    try:
        import polars as pl
    except ImportError as e:  # sandbox has no polars; real deploys may
        raise NotImplementedError(
            "polars is not installed; install polars to use to_polars"
        ) from e
    return pl.from_pandas(df.toPandas())
