"""Streaming fuzzy dedup (streaming/fuzzy.py): the d13 batch twin's
verdicts reproduced by a checkpointed two-epoch run WITH a query
restart between the drops (the resume path the north rule requires)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_spark.streaming.fuzzy import (
    _committed_versions,
    bootstrap_state,
    fuzzy_dedup_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_epoch2_matches_batch_d13_across_restart(spark, tmp_path):
    from pdf_ocr_spark.queries.dedup import QUERIES

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    in_dir = str(tmp_path / "drops")
    state_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    bootstrap_state(spark, state_dir)

    # drop 1: the prior snapshot (even doc_ids); run to completion
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = fuzzy_dedup_stream(spark, in_dir, state_dir, out_dir, ckpt)
    q.awaitTermination(120)
    assert _committed_versions(state_dir) == [-1, 0]

    # drop 2 arrives AFTER the query stopped; restart from the same
    # checkpoint — the new file becomes epoch 1
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = fuzzy_dedup_stream(spark, in_dir, state_dir, out_dir, ckpt)
    q.awaitTermination(120)
    assert _committed_versions(state_dir) == [-1, 0, 1]

    stream_v = {
        r["doc_id"]: (r["verdict"], r["holder"], r["best_jac_milli"])
        for r in spark.read.parquet(f"{out_dir}/epoch=1").collect()
    }
    batch_v = {
        r["doc_id"]: (r["verdict"], r["holder"], r["best_jac_milli"])
        for r in QUERIES["d13_incremental_lsh"](spark, SF).collect()
    }
    assert stream_v == batch_v
    # epoch 0 (no prior index) must contain no dup_prior verdicts
    e0 = spark.read.parquet(f"{out_dir}/epoch=0")
    assert e0.where(F.col("verdict") == "dup_prior").count() == 0
    assert e0.count() == docs.where(F.col("doc_id") % 2 == 0).count()
