"""Watermarked stream-stream interval join: click -> purchase
attribution.

The one Structured Streaming join shape a training-data/analytics
ingest actually runs continuously: every purchase is attributed to
EVERY click by the same user in the preceding `horizon` (a
many-to-many event-time interval join, q43's range-join semantics in
motion).  Batch and streaming share `attribute_purchases` verbatim, so
the batch run over the same rows is the oracle for the streamed result
(q47 is the registered batch twin with a DuckDB oracle on top).

Stream-stream join mechanics this module pins (tests
tests/test_streaming_attribution.py):
  1. An INNER join with watermarks on both sides and an event-time
     range condition emits a match as soon as both rows have arrived —
     across micro-batches in either order (click-then-purchase and
     purchase-then-click both tested).
  2. Spark keeps each side's rows in join state ONLY while the
     OTHER side's watermark still admits a counterpart; once the
     watermark passes click_ts + horizon the click's state is
     reclaimed and a later (now late) purchase produces NO match —
     bounded state is traded for bounded lookback.
  3. Without watermarks + a time-range condition, Spark refuses the
     append-mode stream-stream join outright (state would be
     unbounded) — the range condition is load-bearing, not advisory.

Scale notes: state is sharded by the user_id equi-key (the same
exchange the batch join shuffles on); per-key state is bounded by
horizon x per-user event rate.  At 10^6 events/sec the knobs are
shuffle partitions and the horizon, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
) -> DataFrame:
    """(user_id, click_id, purchase_id, click_ts, purchase_ts, lag_us)
    for every purchase within [click_ts, click_ts + horizon).

    Inputs need (user_id, event_id, ts) columns; watermarks are applied
    only on streaming inputs, so the same function body is the batch
    oracle for the streamed result."""
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", horizon)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", horizon)
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        (
            # the casts are LOAD-BEARING, not defensive: batch parquet
            # reads ts as TIMESTAMP_NTZ, which unix_micros rejects; the
            # NTZ->TZ cast shift cancels in the difference (q41's note)
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("lag_us"),
    )


def stream_attribution(
    spark,
    clicks_path: str,
    purchases_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema,
    **kw,
):
    """Two file streams -> watermarked interval join -> parquet
    (append: each match emitted exactly once)."""
    c = spark.readStream.schema(schema).parquet(clicks_path)
    p = spark.readStream.schema(schema).parquet(purchases_path)
    out = attribute_purchases(c, p, **kw)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
