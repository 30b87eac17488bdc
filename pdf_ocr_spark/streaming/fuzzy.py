"""Streaming fuzzy dedup-at-ingest: d13's incremental MinHash+LSH in
motion.

The batch operator (`queries/dedup.py` d13) covers the at-rest case —
a new batch probed against the prior snapshot's band index.  This
module runs the same protocol continuously: each micro-batch of
arriving documents computes its band rows, probes the STORED index
(bands + shingles of every previously ingested doc), exact-verifies
candidates only at the shared milli-Jaccard threshold, emits one
dup_prior / dup_batch / kept verdict row per new doc, and appends the
batch into the index — incremental cost O(batch) per epoch, exactly
the batch twin's shape.

Exactly-once state uses cdc.py's versioned-directory protocol: index
versions are ``state_dir/v=<epoch>`` (bands/ + shingles/ under each),
readers take the last committed version (bands/_SUCCESS), and a
replayed epoch deterministically rewrites its own version from the
version BEFORE it.  Verdicts land in ``out_dir/epoch=<id>`` with the
same overwrite discipline.

Contract pinned by tests/test_streaming_fuzzy.py: ingesting the even
docs in epoch 0 and the odd docs in epoch 1 — across a QUERY RESTART
between the two drops (availableNow runs sharing one checkpoint, the
resumability the north rule requires) — reproduces the batch d13
verdicts row-for-row for the odd batch.

Scale notes: the index probe is d02's (band_id, band_key) equi-join;
only the arriving batch computes signatures each epoch; the verify
join touches candidates only.  Plain parquet rewrites the index per
version — production appends to an Iceberg/Delta band table instead
and keeps every join unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..queries.dedup import (
    _BANDS,
    _D13_TH_MILLI,
    _N_HASH,
    _shingles,
    _tokens,
)

DOC_SCHEMA = "doc_id long, lang string, text string"


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, sh): the SAME distinct word-3-gram shingles as the
    batch family (shared expression objects)."""
    return docs.select("doc_id", _tokens().alias("toks")).select(
        "doc_id", F.explode(_shingles()).alias("sh")
    )


def band_rows(sh: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key): d02/d13's 16-minhash 8-band rows."""
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("sh")))).alias(
                f"h{i}"
            )
            for i in range(_N_HASH)
        ]
    )
    stack = ", ".join(
        f"{j}, md5(concat(h{2 * j}, h{2 * j + 1}))" for j in range(_BANDS)
    )
    return sig.select(
        "doc_id",
        F.expr(f"stack({_BANDS}, {stack})").alias("band_id", "band_key"),
    )


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v=")
        and os.path.exists(os.path.join(state_dir, d, "bands", "_SUCCESS"))
    )


def bootstrap_state(spark: SparkSession, state_dir: str) -> None:
    """Empty index as version v=-1."""
    empty_b = spark.createDataFrame(
        [], "doc_id long, band_id int, band_key string"
    )
    empty_s = spark.createDataFrame([], "doc_id long, sh string")
    empty_b.write.mode("overwrite").parquet(f"{state_dir}/v=-1/bands")
    empty_s.write.mode("overwrite").parquet(f"{state_dir}/v=-1/shingles")


def verdicts_against(
    batch_docs: DataFrame,
    batch_sh: DataFrame,
    batch_bands: DataFrame,
    prior_bands: DataFrame,
    prior_sh: DataFrame,
) -> DataFrame:
    """d13's verdict relation for one batch against one index."""
    old_side = prior_bands.withColumn(
        "is_prior", F.lit(True)
    ).unionByName(batch_bands.withColumn("is_prior", F.lit(False)))
    b, p = batch_bands.alias("b"), old_side.alias("p")
    cand = (
        b.join(
            p,
            (F.col("p.band_id") == F.col("b.band_id"))
            & (F.col("p.band_key") == F.col("b.band_key")),
        )
        .filter(
            F.col("p.is_prior")
            | (F.col("p.doc_id") < F.col("b.doc_id"))
        )
        .select(
            F.col("b.doc_id").alias("new_id"),
            F.col("p.doc_id").alias("old_id"),
            F.col("p.is_prior"),
        )
        .distinct()
    )
    all_sh = prior_sh.unionByName(batch_sh)
    sizes_new = batch_sh.groupBy("doc_id").agg(F.count("*").alias("na"))
    sizes_old = all_sh.groupBy("doc_id").agg(F.count("*").alias("nb"))
    sa, sb = batch_sh.alias("sa"), all_sh.alias("sb")
    ver = (
        cand.join(sa, F.col("sa.doc_id") == F.col("new_id"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("old_id"))
            & (F.col("sb.sh") == F.col("sa.sh")),
        )
        .groupBy("new_id", "old_id", "is_prior")
        .agg(F.count("*").alias("n_inter"))
        .join(sizes_new.withColumnRenamed("doc_id", "new_id"), "new_id")
        .join(sizes_old.withColumnRenamed("doc_id", "old_id"), "old_id")
        .select(
            "new_id",
            "old_id",
            "is_prior",
            F.expr(
                "CAST(1000 * n_inter div (na + nb - n_inter) AS INT)"
            ).alias("jac_milli"),
        )
        .filter(F.col("jac_milli") >= _D13_TH_MILLI)
    )
    roll = ver.groupBy("new_id").agg(
        F.min(F.when(F.col("is_prior"), F.col("old_id"))).alias(
            "prior_holder"
        ),
        F.min(F.when(~F.col("is_prior"), F.col("old_id"))).alias(
            "batch_holder"
        ),
        F.max("jac_milli").alias("best_jac_milli"),
    )
    return batch_docs.select("doc_id").join(
        roll, batch_docs.doc_id == roll.new_id, "left"
    ).select(
        "doc_id",
        F.when(F.col("prior_holder").isNotNull(), "dup_prior")
        .when(F.col("batch_holder").isNotNull(), "dup_batch")
        .otherwise("kept")
        .alias("verdict"),
        F.coalesce("prior_holder", "batch_holder", "doc_id")
        .cast("long")
        .alias("holder"),
        F.coalesce("best_jac_milli", F.lit(0))
        .cast("int")
        .alias("best_jac_milli"),
    )


def fuzzy_dedup_stream(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
):
    """Start the streaming fuzzy dedup; returns the StreamingQuery.
    Requires ``bootstrap_state`` once (v=-1)."""
    r = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = r.parquet(input_path)

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        prev = [v for v in _committed_versions(state_dir) if v < epoch_id]
        pv = prev[-1]
        prior_b = spark.read.parquet(f"{state_dir}/v={pv}/bands")
        prior_s = spark.read.parquet(f"{state_dir}/v={pv}/shingles")
        sh = shingle_rows(batch_df).persist()
        bands = band_rows(sh).persist()
        out = verdicts_against(batch_df, sh, bands, prior_b, prior_s)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        # index grows by the WHOLE batch (the batch twin probes every
        # prior doc, duplicates included — same contract here)
        prior_s.unionByName(sh).write.mode("overwrite").parquet(
            f"{state_dir}/v={epoch_id}/shingles"
        )
        prior_b.unionByName(bands).write.mode("overwrite").parquet(
            f"{state_dir}/v={epoch_id}/bands"
        )
        sh.unpersist()
        bands.unpersist()

    return (
        stream.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
