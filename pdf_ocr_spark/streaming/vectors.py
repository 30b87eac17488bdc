"""Streaming vector ingest: incremental IVF centroid maintenance —
the s03 batch build's exactly-once streaming twin.

Vectors arrive in micro-batches; the maintained state is the
per-(label, pos) EXACT DECIMAL coordinate sum plus the per-label
count — the same associative partials the batch build (s03) uses, so
after ANY sequence of batches, in ANY partitioning, the maintained
centroids equal the batch-build centroids BIT-FOR-BIT (sum/count is
only evaluated at read time; nothing approximate accumulates).  This
is the index-maintenance loop of a production vector store: routers
(s04 probe, s11 IVF-PQ, s17 entry points) read the latest committed
centroid version while ingest appends.

Exactly-once state uses cdc.py's versioned-directory protocol
(fuzzy.py's twin): versions at ``state_dir/v=<epoch>`` with the
_SUCCESS of the sums write as the commit marker; a replayed epoch
deterministically rewrites its version from the version BEFORE it.

Contract pinned by tests/test_streaming_vectors.py: ingesting even
vec_ids in epoch 0 and odd in epoch 1 — across a QUERY RESTART
between the drops — yields final centroids identical to
``s03_ivf_centroids`` over the whole table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

VEC_SCHEMA = "vec_id long, embedding array<float>, label int"


def batch_sums(vecs: DataFrame) -> DataFrame:
    """(label, pos, s DECIMAL(28,9), n): one micro-batch's exact
    coordinate partials — s03's aggregation without the final
    divide."""
    return (
        vecs.select(
            "label",
            F.posexplode(
                F.expr("transform(embedding, x -> cast(x as double))")
            ).alias("pos0", "val"),
        )
        .select("label", (F.col("pos0") + 1).alias("pos"), "val")
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("val").cast("decimal(28,9)")).alias("s"),
            F.count("*").alias("n"),
        )
    )


def merge_sums(prior: DataFrame, batch: DataFrame) -> DataFrame:
    """Exact decimal merge of two partial-sum tables (associative —
    the whole twin guarantee lives in this being a decimal add)."""
    return (
        prior.unionByName(batch)
        .groupBy("label", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )


def centroids(sums: DataFrame) -> DataFrame:
    """(label, pos, centroid): the read-time divide — identical to
    s03's output expression."""
    return sums.select(
        "label",
        "pos",
        (F.col("s").cast("double") / F.col("n")).alias("centroid"),
    )


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v=")
        and os.path.exists(os.path.join(state_dir, d, "sums", "_SUCCESS"))
    )


def bootstrap_state(spark: SparkSession, state_dir: str) -> None:
    """Empty sums table as version v=-1."""
    empty = spark.createDataFrame(
        [], "label int, pos int, s decimal(28,9), n long"
    )
    empty.write.mode("overwrite").parquet(f"{state_dir}/v=-1/sums")


def centroid_ingest_stream(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
):
    """Start the incremental centroid maintenance; returns the
    StreamingQuery.  Requires ``bootstrap_state`` once (v=-1)."""
    r = spark.readStream.schema(VEC_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = r.parquet(input_path)

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        prev = [v for v in _committed_versions(state_dir) if v < epoch_id]
        pv = prev[-1]
        prior = spark.read.parquet(f"{state_dir}/v={pv}/sums")
        merged = merge_sums(prior, batch_sums(batch_df))
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/v={epoch_id}/sums"
        )

    return (
        stream.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_centroids(spark: SparkSession, state_dir: str) -> DataFrame:
    """Centroids of the last committed version — what the routers
    (s04/s11/s17) read while ingest appends new versions."""
    v = _committed_versions(state_dir)[-1]
    return centroids(spark.read.parquet(f"{state_dir}/v={v}/sums"))
