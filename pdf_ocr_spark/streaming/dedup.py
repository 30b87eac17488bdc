"""Streaming exact dedup: the d01 batch operator's streaming twin.

A training-data ingest that runs continuously (crawl drops arriving as
files) dedups AT INGEST so duplicates never reach storage:
``dropDuplicates`` on the normalized-content hash with a watermark
bounding the dedup state. Spark keeps one state row per key inside the
watermark horizon and emits only first occurrences — the streaming
analogue of d01's ``groupBy(md5(norm)).agg(min(doc_id))``.

Semantics contract (tested): within one micro-batch AND across
micro-batches inside the horizon, only the first arrival of each
content hash is emitted; a duplicate arriving later than the horizon
would re-emit (state was reclaimed) — the documented trade of bounded
state for bounded lookback, exactly how production dedup-at-ingest
works (RocksDB-backed state, horizon = crawl-revisit period).

Scale notes: state is hash->void (16 bytes/key), sharded by the same
key shuffle as the batch groupBy; the knobs at 10^6 docs/sec are
shuffle partitions and the horizon, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_key(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the d01 normalized-content hash (same expression as the
    batch operator, so batch and stream dedup agree key-for-key)."""
    norm = F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))
    return df.withColumn("norm_hash", F.md5(norm))


def dedup_stream(
    docs: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Watermarked first-occurrence filter on the content hash."""
    keyed = content_key(docs, text_col)
    if docs.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
    return keyed.dropDuplicates(["norm_hash"])


def stream_dedup(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema,
    **kw,
):
    """File-stream -> dedup-at-ingest -> parquet (append: each content
    hash's first arrival is written exactly once per horizon)."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    out = dedup_stream(stream, **kw)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
