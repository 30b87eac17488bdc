"""Streaming exact dedup: the d01 batch operator's streaming twin.

A training-data ingest that runs continuously (crawl drops arriving as
files) dedups AT INGEST so duplicates never reach storage:
``dropDuplicatesWithinWatermark`` on the normalized-content hash. Spark
keeps one state row per key and EVICTS it once the watermark passes the
key's event time plus the delay — the streaming analogue of d01's
``groupBy(md5(norm)).agg(min(doc_id))`` with bounded lookback.

Semantics contract (each clause pinned by tests/test_streaming_dedup.py
against a real checkpointed multi-batch run):
  1. Within the horizon — in one micro-batch and across micro-batches —
     exactly one row per content hash is emitted.
  2. The surviving row is ONE representative of the key, not
     necessarily the earliest (doc_id, ts): within a micro-batch Spark
     keeps whichever row the dedup task sees first after the shuffle.
     The KEY set matches batch d01; row identity may differ.
  3. A duplicate arriving after the horizon RE-EMITS (state was
     reclaimed): bounded state is traded for bounded lookback, horizon
     = crawl-revisit period in production.
  4. A row whose event time is already older than the watermark is
     DROPPED ENTIRELY — even if never seen before. This is the
     standard late-data policy; size the horizon above the ingest's
     maximum event-time disorder or unique late shards are lost.

Plain ``dropDuplicates(keys)`` without the event-time column in the key
set NEVER evicts state (measured: numRowsRemoved stays 0 and a
past-horizon duplicate stays suppressed) — unbounded state at crawl
scale, which is why this module uses the WithinWatermark variant.

Scale notes: state is hash->void (16 bytes/key), sharded by the same
key shuffle as the batch groupBy; the knobs at 10^6 docs/sec are
shuffle partitions and the horizon, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_key(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the d01 normalized-content hash — the SAME expression
    object as the batch operator (queries.base.norm_hash), so batch and
    stream dedup agree key-for-key by construction."""
    from ..queries.base import norm_hash

    return df.withColumn("norm_hash", norm_hash(text_col))


def dedup_stream(
    docs: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Watermarked one-per-key filter on the content hash (see module
    docstring for the exact emit/evict/late-drop contract)."""
    keyed = content_key(docs, text_col)
    if docs.isStreaming:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["norm_hash"]
        )
    return keyed.dropDuplicates(["norm_hash"])


def stream_dedup(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema,
    **kw,
):
    """File-stream -> dedup-at-ingest -> parquet (append: one
    representative per content hash per horizon)."""
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
