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
