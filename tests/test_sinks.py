"""CSV/TSV/Parquet sink round-trips (sources/sinks.py —
docpact serialize.py:604-750 semantics)."""

from __future__ import annotations

from pdf_ocr_spark.sources.sinks import write_csv, write_parquet, write_tsv


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5, None), (2, "b,c", 2.5, "x"), (3, 'q"t', 3.5, None)],
        "id long, name string, v double, opt string",
    )


def test_csv_roundtrip(spark, tmp_path):
    df = _frame(spark)
    p = str(tmp_path / "csv_out")
    write_csv(df, p)
    back = (
        spark.read.option("header", True)
        .schema(df.schema)
        .csv(p)
    )
    assert back.count() == 3
    rows = {r["id"]: r for r in back.collect()}
    assert rows[2]["name"] == "b,c"  # delimiter inside quoted field
    assert rows[1]["opt"] is None  # null -> empty -> null round-trip


def test_tsv_roundtrip(spark, tmp_path):
    df = _frame(spark)
    p = str(tmp_path / "tsv_out")
    write_tsv(df, p)
    back = (
        spark.read.option("header", True)
        .option("sep", "\t")
        .schema(df.schema)
        .csv(p)
    )
    assert {r["name"] for r in back.collect()} == {"a", "b,c", 'q"t'}


def test_parquet_partitioned(spark, tmp_path):
    df = _frame(spark)
    p = str(tmp_path / "pq_out")
    write_parquet(df, p, partition_by=["name"])
    back = spark.read.parquet(p)
    assert back.count() == 3
    # partition pruning applies on the partition column
    pruned = back.filter(back["name"] == "a")
    assert pruned.count() == 1


def test_pandas_polars_sinks(spark):
    import pytest

    from pdf_ocr_spark.sources.sinks import to_pandas, to_polars

    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    pdf = to_pandas(df)
    assert list(pdf.columns) == ["id", "v"] and len(pdf) == 3
    try:
        import polars  # noqa: F401

        assert to_polars(df).shape == (3, 2)
    except ImportError:
        with pytest.raises(NotImplementedError):
            to_polars(df)
