"""Watermarked stream-stream interval join: every clause of
streaming/attribution.py's contract against a real checkpointed
multi-batch run — match emission in both arrival orders, state
eviction past the horizon, and the batch-twin equivalence on rows
delivered in-horizon (plus the documented divergence on late rows)."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import types as T

from pdf_ocr_spark.streaming.attribution import (
    attribute_purchases,
    stream_attribution,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
    ]
)


def _t(h, m):
    return dt.datetime(2026, 1, 1, h, m)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("clicks", "purch", "out", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, dirs):
    q = stream_attribution(
        spark, dirs["clicks"], dirs["purch"], dirs["out"], dirs["ckpt"],
        SCHEMA, horizon="30 minutes",
    )
    # a timed-out run would silently overlap the next wave's query on
    # the same checkpoint — fail loudly instead
    assert q.awaitTermination(300), "streaming wave did not finish"


def test_stream_attribution_contract(spark, dirs):
    # wave 1: clicks for users 7 and 8; a purchase for user 10 whose
    # click has NOT arrived yet (purchase-first order)
    _write(spark, dirs["clicks"], [(_t(9, 0), 7, 1), (_t(9, 10), 8, 2)])
    _write(spark, dirs["purch"], [(_t(9, 0), 10, 3)])
    _run(spark, dirs)
    # wave 2: user 7's purchase inside the horizon (click-first order
    # completes), user 10's click arrives (purchase-first order
    # completes), and a purchase with no click at all (no match)
    _write(spark, dirs["clicks"], [(_t(8, 50), 10, 4)])
    _write(spark, dirs["purch"], [(_t(9, 20), 7, 5), (_t(9, 5), 9, 6)])
    _run(spark, dirs)
    # wave 3: both watermarks jump to 12:00 (unmatched users 98/99),
    # evicting user 8's click state (9:10 + 30 min << 11:30); then
    # wave 4 delivers user 8's in-window purchase LATE -> no match
    _write(spark, dirs["clicks"], [(_t(12, 0), 99, 7)])
    _write(spark, dirs["purch"], [(_t(12, 0), 98, 8)])
    _run(spark, dirs)
    _write(spark, dirs["purch"], [(_t(9, 15), 8, 9)])
    _run(spark, dirs)

    out = spark.read.parquet(dirs["out"])
    got = {
        (r["click_id"], r["purchase_id"], r["lag_us"]) for r in out.collect()
    }
    # clause 1: both arrival orders matched; clause 2: the late pair
    # (click 2, purchase 9) is absent
    assert got == {(1, 5, 20 * 60 * 1_000_000), (4, 3, 10 * 60 * 1_000_000)}

    # batch twin over the rows delivered in-horizon == streamed result
    clicks = spark.createDataFrame(
        [(_t(9, 0), 7, 1), (_t(9, 10), 8, 2), (_t(8, 50), 10, 4),
         (_t(12, 0), 99, 7)],
        SCHEMA,
    )
    purch_in_horizon = spark.createDataFrame(
        [(_t(9, 0), 10, 3), (_t(9, 20), 7, 5), (_t(9, 5), 9, 6),
         (_t(12, 0), 98, 8)],
        SCHEMA,
    )
    batch = {
        (r["click_id"], r["purchase_id"], r["lag_us"])
        for r in attribute_purchases(clicks, purch_in_horizon).collect()
    }
    assert batch == got
    # the documented divergence: batch over ALL rows (late one included)
    # ALSO matches (click 2, purchase 9) — the price of bounded state
    purch_all = purch_in_horizon.unionByName(
        spark.createDataFrame([(_t(9, 15), 8, 9)], SCHEMA)
    )
    batch_all = {
        (r["click_id"], r["purchase_id"])
        for r in attribute_purchases(clicks, purch_all).collect()
    }
    assert batch_all == {(1, 5), (4, 3), (2, 9)}
