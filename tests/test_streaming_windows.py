"""Watermarked windowed aggregation: stream == batch once the watermark
passes, and late data beyond the horizon is dropped."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import types as T

from pdf_ocr_spark.streaming.windows import (
    stream_windowed_counts,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)


def _t(h, m):
    return dt.datetime(2026, 1, 1, h, m)


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
    q = stream_windowed_counts(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], SCHEMA,
        window="10 minutes", watermark="30 minutes",
    )
    assert q.awaitTermination(300), "streaming run did not finish"


def _read(spark, dirs):
    return {
        (r.window_start, r.key): r.n_events
        for r in spark.read.parquet(dirs["out"]).collect()
    }


def test_stream_matches_batch_after_watermark(spark, dirs):
    events = [(_t(10, m), "a") for m in range(10)] + [
        (_t(10, 12), "b") for _ in range(3)
    ]
    # sentinel advances the watermark past both real windows
    _write(spark, dirs["in"], events + [(_t(12, 0), "flush")])
    _run(spark, dirs)

    got = _read(spark, dirs)
    want = {
        (r.window_start, r.key): r.n_events
        for r in windowed_counts(
            spark.createDataFrame(events, SCHEMA), streaming=False
        ).collect()
    }
    assert got == want
    assert got[(_t(10, 0), "a")] == 10
    assert got[(_t(10, 10), "b")] == 3


def test_late_event_beyond_watermark_dropped(spark, dirs):
    _write(
        spark,
        dirs["in"],
        [(_t(10, m), "a") for m in range(10)] + [(_t(12, 0), "flush")],
    )
    _run(spark, dirs)
    assert _read(spark, dirs)[(_t(10, 0), "a")] == 10

    # a 2h-late event (watermark is 11:30) + a new sentinel
    _write(spark, dirs["in"], [(_t(10, 5), "a"), (_t(13, 0), "flush2")])
    _run(spark, dirs)

    got = _read(spark, dirs)
    # late event dropped: the 10:00 window was emitted once, count 10
    assert got[(_t(10, 0), "a")] == 10
    # the first sentinel's window is now past the new watermark -> emitted
    assert got[(_t(12, 0), "flush")] == 1
