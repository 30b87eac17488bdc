"""Incremental re-extraction (extract/incremental.py): content-hash CDC
routes only added/changed docs through the kernels; unchanged docs carry
forward; the merged output is bit-identical to a full re-extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows_to_tuples


def _spans_by_doc(df):
    return {
        r["doc_id"]: rows_to_tuples(r["spans"]) for r in df.collect()
    }


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    return str(tmp_path_factory.mktemp("inc"))


def test_incremental_matches_full_reextraction(spark, corpora):
    from pdf_ocr_spark.extract.checkpoint import read_output
    from pdf_ocr_spark.extract.incremental import run_incremental
    from pdf_ocr_spark.sources.synthetic import write_corpus_table

    base = f"{corpora}/base"
    write_corpus_table(spark, base, n_docs=24, skew_docs=1)
    a = spark.read.parquet(base)
    ids = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    changed_ids = ids[:3]
    removed_id = ids[3]

    # corpus B: 3 docs mutated (first span's text edited), 1 removed,
    # 2 added (clones of existing docs under new ids)
    mutated = a.withColumn(
        "spans",
        F.when(
            F.col("doc_id").isin(changed_ids),
            F.expr(
                "transform(spans, (s, i) -> IF(i = 0,"
                " named_struct('kind', s.kind,"
                "  'text', concat(s.text, ' EDITED'),"
                "  'media_ref', s.media_ref, 'offset', s.offset),"
                " s))"
            ),
        ).otherwise(F.col("spans")),
    ).filter(F.col("doc_id") != removed_id)
    added = (
        a.orderBy("doc_id")
        .limit(2)
        .withColumn("doc_id", F.concat(F.lit("new-"), F.col("doc_id")))
    )
    b = mutated.unionByName(added)
    n_b = b.count()

    # cold start on A seeds the manifest
    m1 = run_incremental(spark, a, f"{corpora}/out1")
    assert m1["n_carried"] == 0
    assert m1["n_reextracted"] == m1["n_total"]

    # full re-extraction of B (the ground truth)
    mf = run_incremental(spark, b, f"{corpora}/outF")
    full = _spans_by_doc(read_output(spark, f"{corpora}/outF"))

    # incremental B against A's output
    m2 = run_incremental(
        spark, b, f"{corpora}/out2", prev_dir=f"{corpora}/out1"
    )
    assert m2["n_reextracted"] == 5, m2  # 3 changed + 2 added
    assert m2["n_deleted"] == 1, m2
    assert m2["n_carried"] == n_b - 5, m2
    assert m2["n_total"] == mf["n_total"] == n_b

    inc = _spans_by_doc(read_output(spark, f"{corpora}/out2"))
    assert set(inc) == set(full)
    for doc_id in full:
        assert inc[doc_id] == full[doc_id], doc_id
    assert removed_id not in inc
    # the mutation must actually change extraction output (the CDC is
    # doing real work, not carrying everything)
    out_a = _spans_by_doc(read_output(spark, f"{corpora}/out1"))
    assert any(inc[i] != out_a[i] for i in changed_ids)


def test_incremental_refuses_in_place_refresh(spark, corpora):
    from pdf_ocr_spark.extract.incremental import run_incremental

    a = spark.read.parquet(f"{corpora}/base")
    with pytest.raises(ValueError, match="must differ"):
        run_incremental(
            spark, a, f"{corpora}/out1", prev_dir=f"{corpora}/out1"
        )


def test_incremental_noop_when_nothing_changed(spark, corpora):
    from pdf_ocr_spark.extract.checkpoint import read_output
    from pdf_ocr_spark.extract.incremental import run_incremental

    a = spark.read.parquet(f"{corpora}/base")
    m = run_incremental(
        spark, a, f"{corpora}/out3", prev_dir=f"{corpora}/out1"
    )
    assert m["n_reextracted"] == 0, m
    assert m["n_deleted"] == 0
    assert m["n_carried"] == m["n_total"]
    assert _spans_by_doc(
        read_output(spark, f"{corpora}/out3")
    ) == _spans_by_doc(read_output(spark, f"{corpora}/out1"))


def test_reused_out_dir_does_not_resurrect_deleted_buckets(
    spark, corpora
):
    """A full-snapshot rewrite into a previously used out_dir must not
    keep stale bucket files (the session default is DYNAMIC partition
    overwrite, which only replaces buckets present in the new data —
    incremental.py forces static overwrite for its snapshot write)."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.extract.checkpoint import read_output
    from pdf_ocr_spark.extract.incremental import run_incremental

    a = spark.read.parquet(f"{corpora}/base")
    out_x = f"{corpora}/reuse_x"
    out_y = f"{corpora}/reuse_y"
    run_incremental(spark, a, out_x, n_buckets=4)
    n_a = a.count()
    assert read_output(spark, out_x).count() == n_a
    # shrink the corpus to 2 docs (most buckets become empty), ping-pong
    # through out_y and back into the REUSED out_x
    small = a.orderBy("doc_id").limit(2)
    run_incremental(spark, small, out_y, prev_dir=out_x, n_buckets=4)
    m = run_incremental(spark, small, out_x, prev_dir=out_y, n_buckets=4)
    got = read_output(spark, out_x)
    assert got.count() == 2, (
        "stale bucket files resurrected deleted docs"
    )
    assert m["n_total"] == 2
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in small.select("doc_id").collect()
    )


def test_path_alias_cannot_bypass_in_place_guard(spark, corpora):
    import pytest as _pytest

    from pdf_ocr_spark.extract.incremental import run_incremental

    a = spark.read.parquet(f"{corpora}/base")
    with _pytest.raises(ValueError, match="must differ"):
        run_incremental(
            spark, a, f"{corpora}/out1", prev_dir=f"{corpora}/./out1/"
        )


def test_incremental_check_unique_rejects_duplicate_doc_ids(
    spark, corpora, tmp_path
):
    """check_unique=True fails fast on a CDC batch that violates the
    doc_id-uniqueness precondition (audit finding: duplicates would
    fan out the semi joins and corrupt the next run's accounting)."""
    from pdf_ocr_spark.extract.incremental import run_incremental

    a = spark.read.parquet(f"{corpora}/base")
    dup = a.unionByName(a.limit(1))
    with pytest.raises(ValueError, match="not doc_id-unique"):
        run_incremental(
            spark, dup, str(tmp_path / "dup_out"), check_unique=True
        )
    # the clean batch passes with the check enabled
    m = run_incremental(
        spark, a, str(tmp_path / "ok_out"), check_unique=True
    )
    assert m["n_total"] == a.count()


def test_refresh_write_is_hash_distributed(spark, tmp_path):
    """Round-5 pin: the snapshot write repartitions on the bucket key,
    so the data tree holds exactly ONE file per non-empty bucket at
    ANY task parallelism — the small-file count must not grow with
    cluster width (it measured 2x more files at 4N before the fix)."""
    import os

    from pdf_ocr_spark.extract.incremental import run_incremental
    from pdf_ocr_spark.sources.synthetic import write_corpus_table

    src = str(tmp_path / "hd_corpus")
    write_corpus_table(spark, src, n_docs=40, skew_docs=0)
    a = spark.read.parquet(src)
    out = str(tmp_path / "hd_out")
    run_incremental(spark, a, out, n_buckets=4)
    for name in os.listdir(f"{out}/data"):
        if not name.startswith("bucket="):
            continue
        files = [
            f
            for f in os.listdir(f"{out}/data/{name}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (name, files)
