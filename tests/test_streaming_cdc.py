"""Streaming CDC apply: a split v07 changelog streamed through
multi-epoch MERGEs converges to the batch v08 result row-for-row (and
therefore to the NEW snapshot — the diff→apply round trip, streamed);
version commit protocol verified (one committed version per epoch,
bootstrap v=-1)."""

from __future__ import annotations

from pdf_ocr_spark.queries.validation_q import QUERIES, _V07_OLD_MOD
from pdf_ocr_spark.streaming.cdc import (
    _committed_versions,
    apply_changelog_stream,
    bootstrap_state,
    merge_changelog,
    read_state,
)

SF = "/root/testdata/sf0.001"


def _old_snapshot(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .where(F.col("o_orderkey") % _V07_OLD_MOD != 0)
        .select(
            "o_orderkey",
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
    )


def test_stream_apply_converges_to_batch_v08(spark, tmp_path):
    from pyspark.sql import functions as F

    log = QUERIES["v07_snapshot_diff"](spark, SF)
    # two changelog drops (disjoint by key parity — at most one op per
    # key per batch holds a fortiori), one epoch each
    log_dir = str(tmp_path / "changelog")
    for part in (0, 1):
        log.where(F.col("o_orderkey") % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(log_dir)

    state_dir = str(tmp_path / "state")
    bootstrap_state(_old_snapshot(spark), state_dir)
    q = apply_changelog_stream(
        spark,
        log_dir,
        state_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    # one committed version per epoch, after the v=-1 bootstrap
    assert _committed_versions(state_dir) == [-1, 0, 1]

    final = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_orderpriority"])
        for r in read_state(spark, state_dir).collect()
    }
    batch = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_orderpriority"])
        for r in QUERIES["v08_cdc_apply"](spark, SF).collect()
    }
    assert final == batch


def test_merge_changelog_single_batch_equals_v08(spark):
    """The shared MERGE primitive applied once to the whole changelog
    is v08 exactly (same join shape, no stream machinery)."""
    log = QUERIES["v07_snapshot_diff"](spark, SF)
    merged = {
        tuple(r)
        for r in merge_changelog(_old_snapshot(spark), log).collect()
    }
    batch = {tuple(r) for r in QUERIES["v08_cdc_apply"](spark, SF).collect()}
    assert merged == batch
