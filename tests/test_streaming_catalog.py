"""Streaming ingestion (foreachBatch wrapper) and table-format layer."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pdf_ocr_spark.extract.pipeline import extract
from pdf_ocr_spark.sources.catalog import TableIO, iceberg_available
from pdf_ocr_spark.sources.synthetic import synthetic_corpus
from pdf_ocr_spark.streaming.ingest import stream_extract


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _drop_files(spark, path, n_docs, id_offset=0):
    """One parquet 'file drop' of n_docs docs (append mode)."""
    synthetic_corpus(
        spark, n_docs, skew_docs=0, id_offset=id_offset
    ).write.mode("append").parquet(path)


def test_stream_equals_batch(spark, dirs):
    """availableNow stream over a static drop == batch extract output."""
    _drop_files(spark, dirs["in"], 24)
    q = stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert q.awaitTermination(300), "streaming run did not finish"

    got = (
        spark.read.parquet(dirs["out"])
        .select("doc_id", "spans")
        .orderBy("doc_id")
        .collect()
    )
    want = (
        extract(spark.read.parquet(dirs["in"]))
        .select("doc_id", "spans")
        .orderBy("doc_id")
        .collect()
    )
    assert len(got) == 24
    assert [(r.doc_id, r.spans) for r in got] == [
        (r.doc_id, r.spans) for r in want
    ]


def test_stream_resumes_incrementally(spark, dirs):
    """A second drop + restart processes ONLY the new files (the streaming
    checkpoint is the progress ledger): no duplicates, no reprocessing."""
    _drop_files(spark, dirs["in"], 24)
    assert stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"]).awaitTermination(300)
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 == 24

    _drop_files(spark, dirs["in"], 12, id_offset=1000)  # late-arriving drop
    assert stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"]).awaitTermination(300)
    out = spark.read.parquet(dirs["out"])
    assert out.count() == 24 + 12
    # exactly-once: every doc_id appears once
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_tableio_parquet_fallback_verbs(spark, tmp_path):
    """Sandbox has no Iceberg jars -> TableIO must auto-fall-back and the
    three storage verbs must behave identically to the Iceberg semantics."""
    assert iceberg_available(spark) is False
    io = TableIO(spark)
    assert io.iceberg is False

    tgt = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, bucket int"
    )
    io.create_or_replace(df, tgt, partition_col="bucket")
    assert io.read(tgt).count() == 30

    io.append(
        df.filter("bucket = 0").withColumn("id", F.col("id") + 100),
        tgt,
        partition_col="bucket",
    )
    assert io.read(tgt).count() == 40

    # overwrite only bucket 1's partition; others untouched
    repl = spark.createDataFrame([(999, 1)], "id long, bucket int")
    io.overwrite_partitions(repl, tgt, "bucket")
    out = io.read(tgt)
    assert out.filter("bucket = 1").count() == 1
    assert out.filter("bucket = 0").count() == 20
    assert out.filter("bucket = 2").count() == 10
