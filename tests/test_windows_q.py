"""Literal-frame edge cases for the temporal operators: q41's atomic
(ts, value) pairing on NULL-value purchases (the shipped corpus has
none) and q44's strict stage ordering on out-of-order arrivals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from pdf_ocr_spark.queries.windows import asof_last_purchase, event_funnel

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(m):
    return dt.datetime(2024, 1, 1, 12, m)


def test_asof_null_value_purchase_pairs_atomically(spark):
    # purchase A (value 5.0) then purchase B (value NULL); a later view
    # event must get (B.ts, -1.0) — never the phantom pair (B.ts, 5.0)
    rows = [
        (1, _t(0), 7, "purchase", 5.0),
        (2, _t(10), 7, "purchase", None),
        (3, _t(20), 7, "view", None),
        (4, _t(5), 7, "view", None),  # between A and B -> (A.ts, 5.0)
        (5, _t(1), 8, "view", None),  # other user, no purchase -> sentinel
    ]
    out = {
        r["event_id"]: r
        for r in asof_last_purchase(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert out[3]["last_purchase_ts"] == _t(10)
    assert out[3]["last_purchase_value"] == -1.0
    assert out[4]["last_purchase_ts"] == _t(0)
    assert out[4]["last_purchase_value"] == 5.0
    # the probe-at-purchase row matches itself (>= semantics)
    assert out[2]["last_purchase_ts"] == _t(10)
    # no purchase at all -> epoch/-1 sentinels
    assert out[5]["last_purchase_ts"] == dt.datetime(1970, 1, 1)
    assert out[5]["last_purchase_value"] == -1.0
    assert out[5]["gap_us"] == -1


def test_funnel_orders_stages_strictly(spark):
    rows = [
        # user 7: purchase BEFORE any signup must not count; the one
        # after the full chain does
        (1, _t(0), 7, "purchase", None),
        (2, _t(1), 7, "signup", None),
        (3, _t(2), 7, "view", None),
        (4, _t(3), 7, "click", None),
        (5, _t(4), 7, "purchase", None),
        # user 8: view precedes signup -> only the LATER view counts
        (6, _t(0), 8, "view", None),
        (7, _t(1), 8, "signup", None),
        (8, _t(2), 8, "view", None),
        # user 9: never signs up -> depth 0 despite downstream events
        (9, _t(0), 9, "view", None),
        (10, _t(1), 9, "click", None),
        (11, _t(2), 9, "purchase", None),
    ]
    out = {
        r["user_id"]: r
        for r in event_funnel(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert out[7]["funnel_depth"] == 4
    assert out[7]["first_purchase_ts"] == _t(4)  # not the pre-signup one
    assert out[7]["funnel_lag_us"] == 3 * 60 * 1_000_000
    assert out[8]["funnel_depth"] == 2
    assert out[8]["first_view_ts"] == _t(2)  # not the pre-signup view
    assert out[9]["funnel_depth"] == 0
    assert out[9]["funnel_lag_us"] == -1
    assert out[9]["signup_ts"] == dt.datetime(1970, 1, 1)
