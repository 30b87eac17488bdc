"""q41 as-of join core: the (ts, value) outputs must come from the SAME
purchase row. The shipped corpus has no NULL purchase values, so the
cross-engine gate cannot exercise this — a literal frame does."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from pdf_ocr_spark.queries.windows import asof_last_purchase

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
