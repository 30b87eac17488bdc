"""Executed-plan contracts: the scale shapes PLANS.md claims must hold
in the plans Spark actually builds, not just in docstrings.

Each test renders ``executedPlan().toString()`` (the AQE initial plan —
exchange placement is decided before runtime re-optimization) and
asserts the presence/absence of the operators that define the shape:
Exchange kinds, broadcast builds, pushed filters, pruned read schemas,
and the join strategies that must never appear (CartesianProduct /
BroadcastNestedLoopJoin on corpus-sized relations).
"""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> list[str]:
    # one entry per Exchange node, e.g. 'hashpartitioning', 'SinglePartition',
    # 'roundrobin'; BroadcastExchange is counted separately
    return re.findall(r"\bExchange (\w+)", plan)


def test_t24_encode_is_scan_local(spark):
    """t24 claims ZERO Exchange beyond spread()'s fan-out: the only
    Exchange must be the round-robin spread, never a hash shuffle."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t24_bpe_encode"](spark, SF))
    kinds = _exchanges(plan)
    assert all(k.lower().startswith("roundrobin") for k in kinds), kinds
    assert "CartesianProduct" not in plan


def test_t27_mojibake_is_scan_local(spark):
    """t27 claims ZERO Exchange: a pure narrow map over the scan."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t27_mojibake_repair"](spark, SF))
    assert _exchanges(plan) == [], _exchanges(plan)
    assert "BroadcastExchange" not in plan


def test_q02_filter_reaches_the_scan(spark):
    """Predicate pushdown + column pruning: the parquet scan must carry
    PushedFilters and read a pruned schema, not the full table."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["q02_filter_project"](spark, SF))
    # toString() truncates long bracket lists, so match leniently: at
    # least one concrete pushed filter must be named
    assert re.search(r"PushedFilters: \[\w+\(", plan), "nothing pushed"
    # the scan's output column list (lineitem has 16 columns; the
    # projection must prune most of them)
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m is not None, "no FileScan in plan"
    assert 0 < m.group(1).count("#") <= 8, m.group(1)


def test_d02_lsh_never_goes_all_pairs(spark):
    """d02's candidate generation is a banded equi-join: the plan must
    contain no CartesianProduct and no BroadcastNestedLoopJoin."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["d02_minhash_lsh_dedup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_t26_training_never_shuffles_documents(spark):
    """t26's claim: the document table never shuffles — gradient
    aggregations reduce to single rows (SinglePartition exchanges are
    the allreduce) and stats/weights come back as broadcasts; no
    hashpartitioning Exchange anywhere."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t26_quality_classifier"](spark, SF))
    kinds = _exchanges(plan)
    assert not any("hashpartitioning" in k for k in kinds), kinds
    assert "BroadcastExchange" in plan  # weights return as broadcasts


def test_s13_kcenter_never_shuffles_vectors(spark):
    """s13's claim: the vector table never shuffles — farthest-point
    rounds are single-row allreduces plus broadcast joins."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["s13_kcenter_coreset"](spark, SF))
    kinds = _exchanges(plan)
    assert not any("hashpartitioning" in k for k in kinds), kinds
    assert "BroadcastExchange" in plan


def test_q05_dim_joins_broadcast_the_small_side(spark):
    """The TPC-H dim joins must build broadcast hash joins, not
    shuffle both sides (region/nation/supplier are dim-sized)."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["q05_local_supplier"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Catalyst's runtime Bloom-filter injection (the semi-join
    reduction that matters at 100 TB: the big fact scan is pre-filtered
    by a bloom built from the selective dim side before the shuffle)
    fires on the engine's session settings once the size thresholds
    are met — pinned here with toy thresholds."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1",
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = _plan(j)
        assert "might_contain" in plan, "no runtime bloom filter injected"
        assert "bloom_filter_agg" in plan
        # the filter must sit on the FACT side scan (l_orderkey probe)
        assert re.search(r"might_contain.*l_orderkey", plan)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_s14_coarse_pass_never_shuffles_the_corpus(spark):
    """s14 claims the coarse top-50 is a TakeOrderedAndProject over
    per-partition heaps: the plan must contain TakeOrderedAndProject
    and NO hash/range Exchange of the embeddings relation (only the
    query-vector broadcast)."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["s14_mrl_rerank"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    kinds = [k for k in _exchanges(plan) if "hash" in k.lower()
             or "range" in k.lower()]
    assert kinds == [], kinds
    assert "CartesianProduct" not in plan


def test_v07_diff_is_one_full_outer_join(spark):
    """v07 claims ONE full-outer sort-merge join on the primary key:
    exactly one FullOuter join node, no broadcast-nested-loop, and no
    second pass (one join total)."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["v07_snapshot_diff"](spark, SF))
    assert plan.count("FullOuter") >= 1
    assert len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)) == 1, (
        re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_v09_history_narrows_the_outer_join_per_arm(spark):
    """v09 writes ONE full outer join, but each union arm filters on
    in_old / in_new — Catalyst's outer-join elimination must narrow
    the per-arm join to LeftOuter/RightOuter (never a full outer per
    arm, never nested-loop), which is what unlocks broadcast/bucketed
    strategies at scale."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["v09_scd2_history"](spark, SF))
    joins = re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
        r" [^\n]*?(FullOuter|LeftOuter|RightOuter|Inner)",
        plan,
    )
    assert 1 <= len(joins) <= 2, plan
    assert "FullOuter" not in joins, joins
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_m09_profile_is_scan_local(spark):
    """m09 claims ZERO Exchange: the whole interleave profile is array
    higher-order functions inside the document row."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["m09_interleave_profile"](spark, SF))
    assert _exchanges(plan) == [], _exchanges(plan)
    assert "BroadcastExchange" not in plan


def test_m08_pairing_windows_only_media_grain(spark):
    """m08 claims zero JOIN shuffles: the only Exchanges are the two
    window sorts (hashpartitioning), with no join operator anywhere
    and the rank-1 filter pushed map-side as WindowGroupLimit."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["m08_caption_pair"](spark, SF))
    kinds = _exchanges(plan)
    assert len(kinds) == 2 and all(
        k.startswith("hashpartitioning") for k in kinds
    ), kinds
    assert "Join" not in plan, "m08 must not join a sentence relation"
    assert "WindowGroupLimit" in plan


def test_t30_scoring_broadcasts_the_weight_table(spark):
    """t30 claims the <=1024-row weight table broadcasts onto the
    bigram stream: the scoring join must be a BroadcastHashJoin, and
    the big side must never hash-shuffle for a join (the only
    hashpartitioning Exchanges are the two aggregates: bucket counts
    and the per-doc sum)."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t30_dsir_weights"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or plan.count(
        "SortMergeJoin"
    ) <= 1  # the final doc_id reattach may sort-merge; scoring may not
    assert "CartesianProduct" not in plan


def test_q50_cube_is_two_phase(spark):
    """q50 claims the two-phase CUBE: the Expand must sit ABOVE the
    finest-grain pre-aggregation (multiplying the tiny aggregate, not
    the scan) — i.e. in the top-down plan the cube's grouping-id
    Exchange prints first, then Expand, then the pre-agg Exchange."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["q50_grouping_cube"](spark, SF))
    kinds = _exchanges(plan)
    assert len(kinds) == 2 and all(
        k.startswith("hashpartitioning") for k in kinds
    ), kinds
    i_cube = plan.index("spark_grouping_id")
    i_expand = plan.index("Expand")
    pre = plan.rindex("Exchange hashpartitioning")
    assert i_cube < i_expand < pre, (i_cube, i_expand, pre)


def test_s15_maxsim_has_no_query_join(spark):
    """s15 claims the query vectors fold into the projection as
    literals: no join, no broadcast, exactly one doc_id aggregate
    Exchange."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["s15_colbert_maxsim"](spark, SF))
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan
    kinds = _exchanges(plan)
    assert len(kinds) == 1 and kinds[0].startswith(
        "hashpartitioning"
    ), kinds


def test_t31_texttiling_is_scan_local(spark):
    """t31 claims ZERO Exchange: scores and boundary tests are in-row
    array math; the plan is scan -> project -> explode."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t31_texttiling"](spark, SF))
    assert _exchanges(plan) == [], _exchanges(plan)
    assert "Join" not in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The scale notes throughout PLANS.md lean on 'on a bucketed
    lakehouse table the exchange disappears' — this pins it in a real
    executed plan: both join sides written bucketBy(orderkey), the
    broadcast path disabled, and the join must contain a SortMergeJoin
    with ZERO shuffle Exchange; results equal the plain join."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}'"
    )
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        li.write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable("bdb.li_b")
        orders.write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).mode("overwrite").saveAsTable("bdb.ord_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bdb.li_b").join(
            spark.table("bdb.ord_b"),
            spark.table("bdb.li_b").l_orderkey
            == spark.table("bdb.ord_b").o_orderkey,
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert _exchanges(plan) == [], _exchanges(plan)
        assert "BroadcastExchange" not in plan
        # same rows as the plain (shuffling) parquet join
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert j.count() == plain.count()
        from pyspark.sql import functions as F

        s_b = j.agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        ).collect()[0][0]
        s_p = plain.agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        ).collect()[0][0]
        assert s_b == s_p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


# --------------------------------------------------------------------
# Round-4 de-globalization contracts: the four former single-partition
# window plans (s12/t32/t35/v15) must never again move a corpus-grain
# row stream through one partition.  The global-window detector is
# SHARED with the registry-wide audit (tools/audit_plans.py) — one
# implementation, so the contract tests and the audit can never
# disagree on what counts as a global window.
from tools.audit_plans import (  # noqa: E402
    global_window_specs as _global_window_specs,
    window_specs as _window_specs,
)


def _assert_partition_local_windows_only(plan: str) -> None:
    """Every Window in the plan must be partitioned (the
    two_phase_topk phase-1 partitions by a projected
    spark_partition_id column: sort-based, spillable, bounded per
    task) — never a global window over the row stream."""
    assert _global_window_specs(plan) == [], _global_window_specs(plan)
    assert _window_specs(plan), "expected the phase-1 windows"
    # the partition key is the projected spark_partition_id column
    assert "SPARK_PARTITION_ID" in plan.upper(), "phase-1 key missing"


def test_s12_arm_ranking_is_two_phase_topk(spark):
    """s12's per-arm top-100 is the shared two-phase top-k: phase 1 is
    a spark_partition_id-partitioned (spillable) window, phase 2 a
    bounded merge — never a global row_number over every scored
    doc."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["s12_hybrid_rrf"](spark, SF))
    _assert_partition_local_windows_only(plan)


def test_t32_weighted_sample_is_two_phase_topk(spark):
    """t32's A-ES global top-k is the shared two-phase merge — only
    spark_partition_id-partitioned windows, no global sort of the
    corpus."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t32_weighted_sample"](spark, SF))
    _assert_partition_local_windows_only(plan)


def test_t35_prefix_sums_are_chunk_partitioned(spark):
    """t35's cumulative curve = chunk-partitioned local prefix sums +
    broadcast offsets: every Window must carry a partition key, and
    the offsets side must come back as a broadcast."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["t35_vocab_growth"](spark, SF))
    assert _global_window_specs(plan) == [], _global_window_specs(plan)
    assert "BroadcastExchange" in plan


def test_v15_depth_histogram_has_no_global_ntile(spark):
    """v15's equi-depth arm runs on the value histogram with windows
    partitioned by col_name — no global (unpartitioned) window, no
    ntile over the row stream."""
    from pdf_ocr_spark.queries import FULL_QUERIES

    plan = _plan(FULL_QUERIES["v15_column_histograms"](spark, SF))
    assert _global_window_specs(plan) == [], _global_window_specs(plan)
    assert "ntile" not in plan.lower()


def test_s17_build_has_no_all_pairs_crossjoin(spark):
    """Round-4 contract: s17's graph build is the LSH-seeded
    NN-descent candidate join — no corpus x corpus crossJoin.  The
    build is lineage-truncated (localCheckpoint), so assert at the
    source level that the only crossJoin in the operator is the
    broadcast beam0 fan-out, and at the plan level that the search
    contains no CartesianProduct."""
    import inspect

    from pdf_ocr_spark.queries import FULL_QUERIES
    from pdf_ocr_spark.queries.similarity import s17

    src = inspect.getsource(s17)
    for frag in src.split("crossJoin(")[1:]:
        assert frag.lstrip().startswith("F.broadcast("), frag[:60]
    plan = _plan(FULL_QUERIES["s17_graph_beam_search"](spark, SF))
    assert "CartesianProduct" not in plan


def test_audit_splitter_sees_nested_commas():
    """The audit's windowspec splitter must split on TOP-LEVEL commas
    only: 'coalesce(a, b) DESC' is ONE ordering token, not a partition
    key + a dangling token — a bare comma split would let a genuinely
    global window pass the audit (audit finding)."""
    # global window ordered by a nested call: NO partition key anywhere
    spec = "coalesce(a#1, b#2) DESC NULLS LAST, "
    plan = f"windowspecdefinition({spec}specifiedwindowframe"
    assert _global_window_specs(plan), "nested-comma global missed"
    # partitioned window with the same nested ordering: not flagged
    spec2 = "part#3, coalesce(a#1, b#2) DESC NULLS LAST, "
    plan2 = f"windowspecdefinition({spec2}specifiedwindowframe"
    assert _global_window_specs(plan2) == []


@pytest.mark.slow
def test_registry_wide_plan_audit(spark):
    """CI fold of tools/audit_plans.py (round-4 verdict ask): every
    FULL_QUERIES entry renders an executed plan with no global
    (unpartitioned) window beyond the reviewed BOUNDED_GLOBAL_WINDOWS
    allowlist and no CartesianProduct — a new scale-killer anywhere
    in the registry is a CI failure, not a review finding.  The
    detector and the allowlist are imported from the audit tool: one
    implementation, one reviewed place to argue exceptions."""
    from pdf_ocr_spark.queries import FULL_QUERIES
    from tools.audit_plans import BOUNDED_GLOBAL_WINDOWS

    failures = []
    for name, fn in FULL_QUERIES.items():
        try:
            plan = _plan(fn(spark, SF))
        except Exception as e:  # noqa: BLE001 — collect, report once
            failures.append(f"{name}: ERR {type(e).__name__}: {e}")
            continue
        gw = _global_window_specs(plan)
        cart = plan.count("CartesianProduct")
        allowed = BOUNDED_GLOBAL_WINDOWS.get(name, 0)
        if cart:
            failures.append(f"{name}: {cart} CartesianProduct node(s)")
        if len(gw) > allowed:
            failures.append(
                f"{name}: {len(gw)} global window(s), "
                f"allowlisted {allowed}: {gw}"
            )
    assert not failures, "\n".join(failures)
