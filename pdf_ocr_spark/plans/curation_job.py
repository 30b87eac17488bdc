"""End-to-end corpus curation job: the 100-TB training-data pipeline
as ONE composed Spark job over the public operator API.

Pipeline (the fixed production order; each stage is an oracle-green
operator from queries/):

  quality (t02) -> entropy (t22) -> C4 content rules (t11.c4_keep) ->
  URL blocklist (t12) -> shingle novelty (t29: boilerplate out; docs
  too short to shingle pass trivially) -> domain mixture (t15) ->
  exact dedup keeper (d01) -> fuzzy dedup survivor (d12) ->
  per-language sequence packing -> partitioned shard write

The c4 stage applies t11's C4 half only: t11 also computes the full
Gopher rule set, but Gopher's 50-word floor rejects this synthetic
corpus outright (every doc is shorter), so the funnel would be empty.
A production corpus swaps the stage flag to `c4_keep AND gopher_keep`
— one expression, same plan.

Every stage contributes a boolean flag on the doc grain; the funnel
verdict ANDs them in order, and the per-stage survivor counts come
from ONE aggregation over the flag relation (first-fail semantics, the
t01 suite's curation_keep extended by the dedup stages).  Survivors
pack per language in doc_id order into fixed token bins and write as
parquet partitioned by (lang, bin) — the training-shard layout.

Scale notes: each member operator re-reads the corpus here
(composition through the public API keeps every stage independently
oracle-checked); a fused production run computes the scan-local flags
(t02/t11/t12/t22) in one pass and materializes the two dedup relations
— the joins below are unchanged.  All flag relations are doc-grain
(one row/doc); the only wide data movement is the survivors' shuffle
into language shards for packing and the final write.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..queries import dedup as dedup_q
from ..queries import textstats as text_q
from ..queries.base import norm_hash, t

#: the funnel stages in fixed order: (name, column holding the flag)
STAGES = (
    "quality",
    "entropy",
    "c4",
    "url",
    "novelty",
    "mixture",
    "exact_dedup",
    "fuzzy_dedup",
)


def curation_flags(spark, sf_dir: str):
    """Doc-grain relation (doc_id, lang, n_tok, <stage flags...>):
    every funnel stage's verdict for every document."""
    # the content key is null-safed to '' on BOTH sides of the d01 join
    # so a NULL-text doc still flows through the funnel (and fails its
    # stages) instead of silently vanishing from the inner hash join
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        F.coalesce(norm_hash(), F.lit("")).alias("_nh"),
    )
    q2 = text_q.QUERIES["t02_quality_score"](spark, sf_dir).select(
        "doc_id", (F.col("keep") == 1).alias("quality")
    )
    q22 = text_q.QUERIES["t22_char_entropy"](spark, sf_dir).select(
        "doc_id", F.col("entropy_keep").alias("entropy")
    )
    q11 = text_q.QUERIES["t11_gopher_rules"](spark, sf_dir).select(
        "doc_id", (F.col("c4_keep") == 1).alias("c4")
    )
    q12 = text_q.QUERIES["t12_url_filter"](spark, sf_dir).select(
        "doc_id", (F.col("url_keep") == 1).alias("url")
    )
    q15 = text_q.QUERIES["t15_domain_mixture"](spark, sf_dir).select(
        "doc_id", F.col("mix_keep").alias("mixture")
    )
    # left join: shingle-less docs (< 3 tokens) have no t29 row and
    # pass the stage trivially (they can't be boilerplate-by-repetition)
    q29 = text_q.QUERIES["t29_shingle_novelty"](spark, sf_dir).select(
        "doc_id", (~F.col("boilerplate")).alias("novelty")
    )
    d01 = dedup_q.QUERIES["d01_exact_dedup"](spark, sf_dir).select(
        F.coalesce(F.col("norm_hash"), F.lit("")).alias("_nh"),
        F.col("keeper_doc_id").alias("_keeper"),
    )
    d12 = dedup_q.QUERIES["d12_fuzzy_dedup_funnel"](spark, sf_dir).select(
        "doc_id", F.col("keep").alias("fuzzy_dedup")
    )
    return (
        docs.join(q2, "doc_id")
        .join(q22, "doc_id")
        .join(q11, "doc_id")
        .join(q12, "doc_id")
        .join(q29, "doc_id", "left")
        .withColumn("novelty", F.coalesce("novelty", F.lit(True)))
        .join(q15, "doc_id")
        .join(d01, "_nh")
        .withColumn("exact_dedup", F.col("doc_id") == F.col("_keeper"))
        .join(d12, "doc_id")
        .drop("_nh", "_keeper")
    )


def pack_survivors(flags, bin_tokens: int = 512):
    """Funnel survivors packed per language in doc_id order: bin = the
    fixed-size token bin each doc STARTS in (t13's chunking contract,
    survivor-only) — (doc_id, lang, n_tok, bin)."""
    survivors = flags.filter(F.expr(" AND ".join(STAGES)))
    wl = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return survivors.select(
        "doc_id",
        "lang",
        "n_tok",
        F.floor(
            (F.sum("n_tok").over(wl) - F.col("n_tok")) / bin_tokens
        ).cast("int").alias("bin"),
    )


def curate(
    spark,
    sf_dir: str,
    output_dir: str | None = None,
    bin_tokens: int = 512,
) -> dict:
    """Run the full funnel; optionally write packed shards.

    Returns the job report: input size, per-stage survivor counts (in
    the fixed funnel order), output size, token totals, and shard
    count."""
    flags = curation_flags(spark, sf_dir).persist()
    # persist packed: the shard count and the write would otherwise
    # each replay the survivors filter + per-language cumsum window
    packed = pack_survivors(flags, bin_tokens).persist()
    try:
        # per-stage survivor counts from ONE aggregation: survivors_k =
        # docs passing stages 1..k (first-fail semantics)
        chained = []
        acc = F.lit(True)
        for s in STAGES:
            acc = acc & F.col(s)
            chained.append(F.sum(acc.cast("long")).alias(f"after_{s}"))
        rep = flags.agg(
            F.count("*").alias("n_in"),
            *chained,
            F.sum(F.when(acc, F.col("n_tok"))).alias("out_tokens"),
        ).collect()[0]

        n_shards = packed.select("lang", "bin").distinct().count()
        if output_dir is not None:
            packed.write.mode("overwrite").partitionBy(
                "lang", "bin"
            ).parquet(output_dir)
    finally:
        packed.unpersist()
        flags.unpersist()
    report = {"n_in": rep["n_in"]}
    for s in STAGES:
        report[f"after_{s}"] = rep[f"after_{s}"]
    report["n_out"] = rep[f"after_{STAGES[-1]}"]
    report["out_tokens"] = int(rep["out_tokens"] or 0)
    report["n_shards"] = n_shards
    return report
