"""Structured Streaming ingestion for the extraction engine.

The reference is strictly batch (SURVEY.md §2.10); this wraps the SAME
batch extraction logic in a streaming shell, exactly as §2.10 plans:
``readStream -> foreachBatch(extract) -> idempotent sink`` with
``Trigger.AvailableNow`` for catch-up runs and the streaming checkpoint
for exactly-once progress.

Why foreachBatch and not a streaming-native plan: the extraction stage
is a deterministic per-document map (no cross-row state, no event-time
windows), so micro-batches of whole documents are the right grain --
watermarks/stateful operators would add machinery with nothing to
compute.  Streaming checkpointing composes with (does not replace) the
batch ledger in extract/checkpoint.py: the stream tracks which input
FILES are done, the ledger tracks per-bucket lineage/metrics inside each
epoch's output.

Scale notes: at 10^12 docs the source is an Iceberg/file stream whose
discovery is incremental (maxFilesPerTrigger bounds epoch size); each
epoch runs the identical salted/skew-aware pipeline, so a mega-document
inside one epoch cannot pin the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extract.pipeline import BIG_DOC_THRESHOLD, extract
from ..extract.schema import INPUT_SCHEMA


def read_doc_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of (doc_id, spans) parquet drops."""
    r = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_path)


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    big_doc_threshold: int = BIG_DOC_THRESHOLD,
    salt_partitions: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming extraction job; returns the StreamingQuery.

    ``available_now=True`` = process everything currently in the source
    then stop (the catch-up / backfill mode); False = run continuously
    on the default trigger.
    """
    stream = read_doc_stream(spark, input_path, max_files_per_trigger)

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        out = extract(batch_df, big_doc_threshold, salt_partitions)
        # append is safe: the streaming checkpoint guarantees each input
        # file is processed by exactly one committed epoch
        out.write.mode("append").parquet(output_path)

    writer = (
        stream.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
