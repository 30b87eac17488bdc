"""Streaming windowed aggregation with watermarked late-data handling.

The reference has no streaming at all (SURVEY.md §2.10); this provides
the engine's event-time path: tumbling/sliding window counts over a
document-event stream with a watermark bounding state for late data.
Batch and streaming share the same windowed-aggregation expression, so
`windowed_counts(batch_df)` is the oracle for the streamed result --
that equivalence is the test contract (Structured Streaming guarantees
it for append-mode windows once the watermark passes).

Scale notes: state per key x window is bounded by the watermark horizon;
the shuffle is on (window, key) -- exactly the batch groupBy shape; with
10^6 events/sec the knobs are shuffle partitions and the watermark
delay, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "kind",
    streaming: bool | None = None,
) -> DataFrame:
    """(window_start, window_end, key, n_events) tumbling (or sliding)
    event-time counts; watermark applied only on streaming inputs."""
    streaming = events.isStreaming if streaming is None else streaming
    if streaming:
        events = events.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.groupBy(win.alias("w"), F.col(key_col).alias("key"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n_events",
        )
    )


def stream_windowed_counts(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema,
    **kw,
):
    """File-stream -> watermarked windowed counts -> parquet (append mode:
    a window is emitted exactly once, when the watermark passes it)."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    agg = windowed_counts(stream, **kw)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
