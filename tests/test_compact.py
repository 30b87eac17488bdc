"""Small-file compaction (extract/compact.py): file counts shrink to
the target, data survives bit-identically, metadata trees untouched."""

from __future__ import annotations

import os

from tests.conftest import rows_to_tuples


def _spans_by_doc(df):
    return {
        r["doc_id"]: rows_to_tuples(r["spans"]) for r in df.collect()
    }


def test_compaction_shrinks_files_and_preserves_rows(spark, tmp_path):
    from pdf_ocr_spark.extract.checkpoint import read_output, run_resumable
    from pdf_ocr_spark.extract.compact import (
        compact_output,
        data_file_counts,
    )
    from pdf_ocr_spark.sources.synthetic import write_corpus_table

    src = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_corpus_table(spark, src, n_docs=24, skew_docs=1)
    inp = spark.read.parquet(src)
    # two chunked runs append multiple files per bucket
    run_resumable(spark, inp, out, n_buckets=4, chunk_buckets=1)
    before_rows = _spans_by_doc(read_output(spark, out))
    before_files = data_file_counts(out)
    assert sum(before_files.values()) > 4  # small-file problem is live

    ledger_before = sorted(
        map(tuple, spark.read.parquet(f"{out}/_progress").collect())
    )
    stats = compact_output(spark, out, files_per_bucket=1)
    after_files = data_file_counts(out)
    assert set(after_files) == set(before_files)  # same buckets
    assert all(v == 1 for v in after_files.values()), after_files
    assert stats["files_after"] == len(after_files)
    assert stats["files_before"] == sum(before_files.values())
    assert stats["n_rows"] == len(before_rows)

    after_rows = _spans_by_doc(read_output(spark, out))
    assert after_rows == before_rows
    # ledger untouched; no leftover staging trees
    assert (
        sorted(
            map(tuple, spark.read.parquet(f"{out}/_progress").collect())
        )
        == ledger_before
    )
    assert not os.path.exists(f"{out}/data_compacting")
    assert not os.path.exists(f"{out}/data_precompact")


def test_compaction_multi_file_target(spark, tmp_path):
    from pdf_ocr_spark.extract.checkpoint import read_output, run_resumable
    from pdf_ocr_spark.extract.compact import (
        compact_output,
        data_file_counts,
    )
    from pdf_ocr_spark.sources.synthetic import write_corpus_table

    src = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_corpus_table(spark, src, n_docs=24, skew_docs=0)
    inp = spark.read.parquet(src)
    run_resumable(spark, inp, out, n_buckets=2, chunk_buckets=1)
    before = _spans_by_doc(read_output(spark, out))
    compact_output(spark, out, files_per_bucket=2)
    counts = data_file_counts(out)
    assert all(v <= 2 for v in counts.values()), counts
    assert _spans_by_doc(read_output(spark, out)) == before


def test_compaction_recovers_from_crash_states(spark, tmp_path):
    """Every state a crashed compaction can leave behind is repaired by
    the next invocation: missing data + precompact present (mid-swap),
    leftover precompact beside live data (mid-cleanup), leftover
    staging tree (mid-write)."""
    import os
    import shutil

    from pdf_ocr_spark.extract.checkpoint import read_output, run_resumable
    from pdf_ocr_spark.extract.compact import compact_output
    from pdf_ocr_spark.sources.synthetic import write_corpus_table

    src = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_corpus_table(spark, src, n_docs=12, skew_docs=0)
    run_resumable(
        spark, spark.read.parquet(src), out, n_buckets=2, chunk_buckets=1
    )
    rows = sorted(
        r["doc_id"] for r in read_output(spark, out).collect()
    )

    # crash between the two swap renames: data gone, precompact intact
    os.rename(f"{out}/data", f"{out}/data_precompact")
    stats = compact_output(spark, out, files_per_bucket=1)
    assert stats["n_rows"] == len(rows)
    assert sorted(
        r["doc_id"] for r in read_output(spark, out).collect()
    ) == rows

    # crash during cleanup: stale precompact beside the live tree
    shutil.copytree(f"{out}/data", f"{out}/data_precompact")
    # crash mid-write: stale staging tree too
    shutil.copytree(f"{out}/data", f"{out}/data_compacting")
    stats = compact_output(spark, out, files_per_bucket=1)
    assert stats["n_rows"] == len(rows)
    assert not os.path.exists(f"{out}/data_precompact")
    assert not os.path.exists(f"{out}/data_compacting")
    assert sorted(
        r["doc_id"] for r in read_output(spark, out).collect()
    ) == rows


def test_compact_empty_tree_raises_clearly(spark, tmp_path):
    """An empty/missing data tree is a clear ValueError, not an opaque
    'NoneType + int' from max(bucket) -> NULL (audit finding)."""
    import os

    import pytest

    from pdf_ocr_spark.extract.compact import compact_output

    out = str(tmp_path / "empty_out")
    os.makedirs(f"{out}/data")
    with pytest.raises(ValueError, match="nothing to compact"):
        compact_output(spark, out)
    os.makedirs(f"{out}/data/bucket=0")  # bucket dir, zero files
    with pytest.raises(ValueError, match="nothing to compact"):
        compact_output(spark, out)
