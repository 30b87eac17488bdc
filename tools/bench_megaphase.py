#!/usr/bin/env python
"""Mega-doc branch phase probe: N->4N ratio of the skew path alone.

The full-job scaling study (bench_scaling.py) mixes the small-doc map
path with the mega-doc explode/reassemble branch; this probe isolates
the branch the round-1 verdict flagged (phase ratio 0.69 pre-fusion) by
running a corpus of ONLY mega documents through `extract()` with a
forced-low big_doc_threshold, at 4 and 16 taskset-confined cores,
interleaved A/B with min-of-runs per level.

Longer than the original ~30 s probes (default 1200 mega docs ≈
2-3 min at 4 cores) so co-tenant bursts average out instead of
dominating the measurement.

Usage:  python tools/bench_megaphase.py [n_mega_docs]
        python tools/bench_megaphase.py --worker <cpus> <corpus_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/megaphase_corpus"
N_MEGA = 1200


def worker(cpus: int, corpus_dir: str) -> None:
    from pdf_ocr_spark.extract.pipeline import extract
    from pdf_ocr_spark.session import get_spark

    spark = get_spark(
        cpus=cpus,
        shuffle_partitions=64,
        extra_conf={
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    inp = spark.read.parquet(corpus_dir)
    n = inp.count()
    # warm-up (JIT + Python pool) on a slice, then one measured run;
    # threshold 0 forces EVERY doc down the explode/reassemble branch
    extract(inp.limit(40), big_doc_threshold=0, salt_partitions=64).write.format(
        "noop"
    ).mode("overwrite").save()
    t0 = time.perf_counter()
    extract(inp, big_doc_threshold=0, salt_partitions=64).write.format(
        "noop"
    ).mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "docs": n, "wall_sec": round(wall, 3)}))
    spark.stop()


def _taskset(cpus: int) -> list[str]:
    return ["taskset", "-c", f"0-{cpus - 1}"]


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n_mega = int(sys.argv[1]) if len(sys.argv) > 1 else N_MEGA

    if not os.path.exists(CORPUS):
        from pdf_ocr_spark.session import get_spark
        from pdf_ocr_spark.sources.synthetic import write_corpus_table

        spark = get_spark(cpus=32, shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        # mega docs only: n_docs=0 regular + n skew docs
        write_corpus_table(spark, CORPUS, n_docs=0, skew_docs=n_mega,
                           partitions=128)
        spark.stop()

    runs: dict[int, list[float]] = {4: [], 16: []}
    for _ in range(3):
        for cpus in (4, 16):
            out = subprocess.run(
                _taskset(cpus)
                + [sys.executable, os.path.abspath(__file__), "--worker",
                   str(cpus), CORPUS],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            runs[cpus].append(json.loads(line)["wall_sec"])

    w4, w16 = min(runs[4]), min(runs[16])
    ratio = (w4 / w16) / 4
    print(json.dumps({
        "metric": "megadoc_branch_phase_ratio_N_to_4N",
        "value": round(ratio, 3),
        "n_wall_sec": w4,
        "n4_wall_sec": w16,
        "n_runs": runs[4],
        "n4_runs": runs[16],
        "docs": n_mega,
    }))


if __name__ == "__main__":
    main()
