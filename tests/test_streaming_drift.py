"""Streaming drift monitor: the live report updates in place as new
files arrive (n_curr grows, baseline fixed), and the final streamed
report is row-identical to the batch v05 twin over the same rows —
two physical strategies (two-relation full-outer join vs v05's
single-pass flag aggregation) cross-checking each other."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import types as T

from pdf_ocr_spark.streaming.drift import (
    bin_counts,
    current_report,
    drift_report,
    start_monitor,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _rows(n):
    """The v05 unit test's drifted corpus: click-heavy baseline (days
    1-15), error-heavy current (days 16+)."""
    rows = []
    for i in range(n):
        base = i < n // 2
        day = (i * 7) % 15 + (1 if base else 16)
        ts = datetime(2024, 1, day, hour=(i * 11) % 24) + timedelta(
            minutes=i % 60
        )
        if base:
            et = ["click", "click", "click", "view", "error"][i % 5]
        else:
            et = ["error", "error", "error", "view", "click"][i % 5]
        rows.append(
            {
                "event_id": i,
                "ts": ts,
                "user_id": i % 37,
                "event_type": et,
                "value": float((i * 13) % 500) + 0.5,
                "props": "",
            }
        )
    return rows


def _key(r):
    return r["col_name"]


def test_streaming_drift_monitor(spark, tmp_path):
    rows = _rows(2000)
    base = [r for r in rows if r["ts"].day <= 15]
    curr = [r for r in rows if r["ts"].day > 15]
    half = len(curr) // 2

    base_df = spark.createDataFrame(base, SCHEMA)
    base_counts = bin_counts(base_df).persist()
    base_counts.count()

    stream_dir = str(tmp_path / "stream_in")
    spark.createDataFrame(curr[:half], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    q = start_monitor(stream, "drift_counts_test")
    try:
        q.processAllAvailable()
        rep1 = {
            _key(r): r
            for r in current_report(
                spark, base_counts, "drift_counts_test"
            ).collect()
        }
        # phase 1: monitor live, baseline fixed, current side partial
        assert rep1["event_type"]["n_base"] == len(base) and rep1[
            "event_type"
        ]["n_curr"] == half

        spark.createDataFrame(curr[half:], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        q.processAllAvailable()
        rep2 = current_report(
            spark, base_counts, "drift_counts_test"
        ).collect()
        got = {_key(r): r for r in rep2}
        assert got["event_type"]["n_curr"] == len(curr)
        assert got["event_type"]["drifted"] is True
        assert got["value_bin"]["drifted"] is False
    finally:
        q.stop()

    # the streamed report == the batch v05 twin over the same rows
    # (v05 computes single-pass from the whole table with the day<=15
    # split; the stream accumulated the current half separately)
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(str(tmp_path / "events.parquet"))

    from pdf_ocr_spark.queries.validation_q import QUERIES

    v05 = QUERIES["v05_drift_psi"](spark, str(tmp_path)).collect()
    exp = {_key(r): r for r in v05}
    assert set(exp) == set(got)
    for k in exp:
        assert exp[k].asDict() == got[k].asDict(), k

    # drift_report is also its own batch twin (two-relation form)
    twin = drift_report(
        base_counts, bin_counts(spark.createDataFrame(curr, SCHEMA))
    ).collect()
    assert {_key(r): r.asDict() for r in twin} == {
        k: v.asDict() for k, v in exp.items()
    }
    base_counts.unpersist()
