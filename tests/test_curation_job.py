"""The composed curation job: per-stage counts consistent with the
member operators, funnel monotonicity, survivor uniqueness under both
dedup keys, and the packed-shard layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_spark.plans.curation_job import STAGES, curate, curation_flags
from pdf_ocr_spark.queries import dedup as dedup_q
from pdf_ocr_spark.queries import textstats as text_q
from pdf_ocr_spark.queries.base import norm_hash, t

SF = "/root/testdata/sf0.001"


def test_curation_funnel_and_shards(spark, tmp_path):
    out = str(tmp_path / "shards")
    rep = curate(spark, SF, out, bin_tokens=512)

    # funnel is monotone non-increasing and ends at n_out
    counts = [rep["n_in"]] + [rep[f"after_{s}"] for s in STAGES]
    assert all(a >= b for a, b in zip(counts, counts[1:])), rep
    assert rep["n_out"] == counts[-1]
    assert rep["n_out"] > 0 and rep["n_out"] < rep["n_in"]

    # first stage cross-checked against the member operator directly
    t02 = text_q.QUERIES["t02_quality_score"](spark, SF)
    assert rep["after_quality"] == t02.filter("keep = 1").count()

    # survivors: unique content hash (exact dedup held) and unique
    # fuzzy component (one survivor per near-dup cluster)
    surv = curation_flags(spark, SF).filter(
        F.expr(" AND ".join(STAGES))
    ).select("doc_id", "lang", "n_tok")
    ids = [r["doc_id"] for r in surv.collect()]
    assert len(ids) == rep["n_out"]
    docs = t(spark, SF, "documents").filter(F.col("doc_id").isin(ids))
    assert docs.select(norm_hash()).distinct().count() == len(ids)
    d12 = dedup_q.QUERIES["d12_fuzzy_dedup_funnel"](spark, SF)
    comps = d12.filter(F.col("doc_id").isin(ids)).select("component")
    assert comps.distinct().count() == len(ids)

    # shards on disk: same rows back, bin = floor(preceding-token
    # cumsum / 512) per language in doc_id order, token totals match
    packed = spark.read.parquet(out)
    assert packed.count() == rep["n_out"]
    assert rep["out_tokens"] == (
        packed.agg(F.sum("n_tok")).collect()[0][0]
    )
    rows = sorted(
        packed.collect(), key=lambda r: (r["lang"], r["doc_id"])
    )
    cum = {}
    for r in rows:
        start = cum.get(r["lang"], 0)
        assert r["bin"] == start // 512, r
        cum[r["lang"]] = start + r["n_tok"]
    assert rep["n_shards"] == len({(r["lang"], r["bin"]) for r in rows})


def test_x20_manifest_matches_python_recount(spark):
    """x20: every shard's counts, ordered-member digest, and split mix
    equal a Python recomputation from the collected x17 shards and
    t19 split assignments."""
    import hashlib

    from pdf_ocr_spark.queries.suites import QUERIES as SQ
    from pdf_ocr_spark.queries.textstats import QUERIES as TQ

    sf = "/root/testdata/sf0.001"
    shards = SQ["x17_curation_shards"](spark, sf).collect()
    splits = {
        r["doc_id"]: r["split"]
        for r in TQ["t19_split_leakage"](spark, sf).collect()
    }
    got = {
        (r["lang"], r["bin"]): r
        for r in SQ["x20_shard_manifest"](spark, sf).collect()
    }
    groups = {}
    for r in shards:
        groups.setdefault((r["lang"], r["bin"]), []).append(
            (r["doc_id"], r["n_tok"])
        )
    assert set(got) == set(groups)
    for key, members in groups.items():
        ids = sorted(d for d, _t in members)
        digest = hashlib.md5(
            ",".join(str(d) for d in ids).encode()
        ).hexdigest()
        r = got[key]
        assert r["n_docs"] == len(members)
        assert r["n_tok"] == sum(t for _d, t in members)
        assert r["digest"] == digest
        mix = [splits[d] for d in ids]
        assert (r["n_train"], r["n_val"], r["n_test"]) == (
            mix.count("train"), mix.count("val"), mix.count("test")
        ), key
