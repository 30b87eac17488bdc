"""Streaming dedup-at-ingest: first arrival of each content hash is
emitted exactly once within the watermark horizon, across micro-batches,
and the key agrees with the d01 batch operator."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import types as T

from pdf_ocr_spark.streaming.dedup import content_key, stream_dedup

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def _t(m):
    return dt.datetime(2026, 1, 1, 9, m)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, dirs):
    q = stream_dedup(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], SCHEMA,
        watermark="30 minutes",
    )
    q.awaitTermination(120)


def test_stream_dedup_first_arrival_wins(spark, dirs):
    # batch 1: two distinct texts + an in-batch duplicate (whitespace
    # variant — the normalization must fold it onto the same key)
    _write(
        spark,
        dirs["in"],
        [
            (_t(0), 1, "alpha beta gamma"),
            (_t(1), 2, "Alpha  beta   GAMMA"),  # dup of doc 1 after norm
            (_t(2), 3, "wholly different text"),
        ],
    )
    _run(spark, dirs)
    # batch 2 (same query lineage via checkpoint): a cross-batch dup
    # of doc 3 and one genuinely new doc
    _write(
        spark,
        dirs["in"],
        [
            (_t(5), 4, "wholly different text"),
            (_t(6), 5, "a third unique doc"),
        ],
    )
    _run(spark, dirs)

    out = spark.read.parquet(dirs["out"])
    got = {r["doc_id"]: r["norm_hash"] for r in out.collect()}
    # doc 2 (in-batch dup) and doc 4 (cross-batch dup) suppressed
    assert set(got) == {1, 3, 5}
    # the streaming key equals the batch d01 key, row for row
    batch = {
        r["doc_id"]: r["norm_hash"]
        for r in content_key(
            spark.createDataFrame(
                [(_t(0), 1, "alpha beta gamma"),
                 (_t(2), 3, "wholly different text"),
                 (_t(6), 5, "a third unique doc")],
                SCHEMA,
            )
        ).collect()
    }
    assert got == batch
