"""Streaming vector ingest (streaming/vectors.py): incremental IVF
centroid maintenance whose exact-decimal sums make the maintained
centroids BIT-IDENTICAL to the batch s03 build — verified across a
query restart between two vector drops."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_spark.streaming.vectors import (
    _committed_versions,
    bootstrap_state,
    centroid_ingest_stream,
    latest_centroids,
)

SF = "/root/testdata/sf0.001"


def test_incremental_centroids_equal_batch_s03_across_restart(
    spark, tmp_path
):
    from pdf_ocr_spark.queries.similarity import QUERIES

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    in_dir = str(tmp_path / "drops")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    bootstrap_state(spark, state_dir)

    vecs.where(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = centroid_ingest_stream(spark, in_dir, state_dir, ckpt)
    q.awaitTermination(120)
    assert _committed_versions(state_dir) == [-1, 0]

    # epoch-0 centroids must be the batch build of the even half
    half = {
        (r["label"], r["pos"]): r["centroid"]
        for r in latest_centroids(spark, state_dir).collect()
    }
    import duckdb

    half_ref = {
        (lb, p): c
        for lb, p, c in duckdb.sql(
            f"""SELECT label, pos,
             CAST(sum(CAST(embedding[pos]::DOUBLE AS DECIMAL(28,9)))
                  AS DOUBLE) / count(*)
             FROM '{SF}/embeddings.parquet',
                  unnest(generate_series(1, len(embedding))) AS u(pos)
             WHERE vec_id % 2 = 0 GROUP BY label, pos"""
        ).fetchall()
    }
    assert half == half_ref

    # second drop AFTER the query stopped; restart from the same
    # checkpoint — the maintained state must now equal the FULL batch
    vecs.where(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = centroid_ingest_stream(spark, in_dir, state_dir, ckpt)
    q.awaitTermination(120)
    assert _committed_versions(state_dir) == [-1, 0, 1]

    got = {
        (r["label"], r["pos"]): r["centroid"]
        for r in latest_centroids(spark, state_dir).collect()
    }
    batch = {
        (r["label"], r["pos"]): r["centroid"]
        for r in QUERIES["s03_ivf_centroids"](spark, SF).collect()
    }
    assert got == batch  # bit-identical, not approximately equal
