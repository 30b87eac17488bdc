"""Streaming CDC apply: v08's MERGE in motion.

The batch pair (`queries/validation_q.py` v07 diff / v08 apply) covers
the at-rest case; this module applies a CHANGELOG STREAM to a keyed
state table — the shape a lakehouse pipeline runs continuously
(Delta/Iceberg `MERGE INTO` fed by a CDC feed).  Each micro-batch is
one MERGE: delete/update keys leave the state via a LEFT ANTI join,
upsert rows (U new-values + I) append back.  The per-batch contract is
the standard CDC one — at most one op per key per batch (a compacted
feed); uncompacted feeds compact inside the batch first.

Exactly-once without a transactional table format: state versions are
directories ``state_dir/v=<epoch_id>`` and readers take the LAST
COMMITTED version (`_SUCCESS` written by Spark on completion, epoch id
monotone).  A replayed epoch rewrites ITS OWN version directory from
the SAME previous version — deterministic overwrite, so the
foreachBatch at-least-once contract composes to exactly-once state.

Scale notes: the changelog batch is churn-sized, so the anti-join's
build side is small (AQE broadcasts it) and the upsert union never
touches the base; the full-state rewrite per epoch is the honest cost
of plain parquet — a production deployment swaps the versioned
directory for MERGE INTO on Delta/Iceberg and keeps this module's join
shape unchanged (that rewrite amortization is exactly what those
formats exist for).

Mechanics pinned by tests/test_streaming_cdc.py: multi-epoch apply of
a split v07 changelog converges to the batch v08 result row-for-row,
and the final state equals the NEW snapshot (the diff→apply round
trip, streamed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: changelog schema = v07's output (queries/validation_q.py)
CHANGELOG_SCHEMA = (
    "o_orderkey long, op string, changed_cols string,"
    " old_status string, new_status string,"
    " old_priority string, new_priority string"
)
_STATE_COLS = ("o_orderkey", "o_orderstatus", "o_orderpriority")


def merge_changelog(state: DataFrame, log: DataFrame) -> DataFrame:
    """One MERGE: v08's apply semantics over an arbitrary state
    snapshot (anti-join out D/U keys, append U new-values + I)."""
    touched = log.where(F.col("op") != "I").select("o_orderkey")
    upserts = log.where(F.col("op") != "D").select(
        "o_orderkey",
        F.col("new_status").alias("o_orderstatus"),
        F.col("new_priority").alias("o_orderpriority"),
    )
    return state.join(touched, "o_orderkey", "left_anti").unionByName(
        upserts
    )


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v=")
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    )


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest committed state version."""
    vs = _committed_versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no committed state under {state_dir}")
    return spark.read.parquet(f"{state_dir}/v={vs[-1]}")


def bootstrap_state(initial: DataFrame, state_dir: str) -> None:
    """Write the initial snapshot as version v=-1 (before any epoch)."""
    initial.select(*_STATE_COLS).write.mode("overwrite").parquet(
        f"{state_dir}/v=-1"
    )


def apply_changelog_stream(
    spark: SparkSession,
    changelog_path: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming MERGE; returns the StreamingQuery.

    Requires ``bootstrap_state`` to have been called once (v=-1)."""
    r = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = r.parquet(changelog_path)

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        # replay-safe: a re-run of epoch N reads the version BEFORE N
        # (its own partial v=N has no _SUCCESS) and rewrites v=N from
        # the same input — deterministic overwrite = exactly-once.
        prev = [v for v in _committed_versions(state_dir) if v < epoch_id]
        state = spark.read.parquet(f"{state_dir}/v={prev[-1]}")
        merged = merge_changelog(state, batch_df)
        merged.write.mode("overwrite").parquet(f"{state_dir}/v={epoch_id}")

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
