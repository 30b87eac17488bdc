"""Table-format layer: Iceberg when the runtime jars are present,
Parquet fallback otherwise (SURVEY.md §7.2 -- "tests can fall back to
Parquet if Iceberg jars are unavailable in sandbox, keeping the
table-format layer pluggable").

The north_rule's input/output are Iceberg tables; everything
Iceberg-specific the pipeline relies on is narrow and declared here:

  - identity/bucket partitioning on write (``partitionedBy``),
  - idempotent replace of a partition subset (``overwritePartitions``),
  - snapshot-isolated append.

The Parquet fallback implements the same three verbs with dynamic
partition overwrite, which is what extract/checkpoint.py already uses --
so every pipeline/test path runs unchanged in either mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ICEBERG_CATALOG = "local"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured and its classes load."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    return (
        spark.conf.get(f"spark.sql.catalog.{ICEBERG_CATALOG}", None)
        is not None
    )


def attach_iceberg(spark_builder, warehouse: str):
    """Builder-time config for a Hadoop-catalog Iceberg warehouse."""
    return (
        spark_builder.config(
            f"spark.sql.catalog.{ICEBERG_CATALOG}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config(f"spark.sql.catalog.{ICEBERG_CATALOG}.type", "hadoop")
        .config(
            f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse", warehouse
        )
    )


class TableIO:
    """The three storage verbs the engine needs, format-pluggable."""

    def __init__(self, spark: SparkSession, use_iceberg: bool | None = None):
        self.spark = spark
        self.iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )

    # -- reads ---------------------------------------------------------
    def read(self, target: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(target)
        return self.spark.read.parquet(target)

    # -- writes --------------------------------------------------------
    def create_or_replace(
        self, df: DataFrame, target: str, partition_col: str | None = None
    ) -> None:
        if self.iceberg:
            w = df.writeTo(target).using("iceberg")
            if partition_col:
                w = w.partitionedBy(F.col(partition_col))
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_col:
                w = w.partitionBy(partition_col)
            w.parquet(target)

    def append(
        self, df: DataFrame, target: str, partition_col: str | None = None
    ) -> None:
        """``partition_col`` is required in parquet mode when the table
        was created partitioned (Iceberg carries partitioning as table
        metadata; a parquet directory cannot mix layouts)."""
        if self.iceberg:
            df.writeTo(target).append()
        else:
            w = df.write.mode("append")
            if partition_col:
                w = w.partitionBy(partition_col)
            w.parquet(target)

    def overwrite_partitions(
        self, df: DataFrame, target: str, partition_col: str
    ) -> None:
        """Replace exactly the partitions present in ``df`` (the resume
        ledger's idempotent-commit verb)."""
        if self.iceberg:
            df.writeTo(target).overwritePartitions()
        else:
            # requires spark.sql.sources.partitionOverwriteMode=dynamic
            # (set by session.get_spark)
            df.write.mode("overwrite").partitionBy(partition_col).parquet(
                target
            )
