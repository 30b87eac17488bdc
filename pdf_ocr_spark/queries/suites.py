"""Driver-registry suites: homogeneous query families merged into one
registered entry each, so the round driver's CORRECTNESS gate (which
records at most ~50 entries, in registry order) covers EVERY operator.

Merging rules (cross-engine-safe by construction):
  - wide join on a shared key (doc_id / user_id) when each member emits
    one row per key — cells keep their own columns, so the comparator's
    per-cell float normalization still applies;
  - tagged UNION ALL on a fixed (fam, keys..., values...) schema when
    shapes differ — numeric values stay in typed numeric columns, never
    stringified, for the same reason;
  - integer aggregates in DuckDB SQL are CAST(... AS BIGINT) at the
    outermost projection (DuckDB SUM over integers returns HUGEINT,
    which pandas widens to float64/object and the driver's normalizer
    then renders differently from Spark's bigint).

The fine-grained member queries stay importable (tests, bench.py, and
tools/check_correctness.py --full use them); only the driver registry
exposes the merged form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import (
    analytics_ext,
    classify_q,
    dedup,
    extract_q,
    fonts_q,
    functions_q,
    multimodal_q,
    retrieval_q,
    schema_map_q,
    setops_arrays,
    similarity,
    textstats,
    tpch,
    validation_q,
    windows,
)

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


def _sub(module, name: str) -> str:
    """A member query's oracle SQL as a parenthesizable subquery."""
    return "(\n" + module.ORACLE[name].strip() + "\n)"


# ================================================================ tpch
# q04/q06/q08: semi-join, scalar agg, anti-join — (fam, k, v, n)
@q(
    "q04_semi_anti_suite",
    oracle=f"""
SELECT 'q04_priority' AS fam, o_orderpriority AS k, 0.0 AS v,
       order_count AS n
FROM {_sub(tpch, "q04_order_priority")} _a
UNION ALL
SELECT 'q06_forecast', 'all', revenue, 0 FROM {_sub(tpch, "q06_forecast_revenue")} _b
UNION ALL
SELECT 'q08_inactive', c_mktsegment, 0.0, n_inactive
FROM {_sub(tpch, "q08_customers_without_orders")} _c
""",
)
def q04_suite(spark, sf):
    """q04 order-priority semi-join + q06 forecast scalar agg + q08
    customers-without-orders anti-join, tagged-unioned."""
    a = tpch.QUERIES["q04_order_priority"](spark, sf).select(
        F.lit("q04_priority").alias("fam"),
        F.col("o_orderpriority").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("order_count").alias("n"),
    )
    b = tpch.QUERIES["q06_forecast_revenue"](spark, sf).select(
        F.lit("q06_forecast").alias("fam"),
        F.lit("all").alias("k"),
        F.col("revenue").alias("v"),
        F.lit(0).cast("long").alias("n"),
    )
    c = tpch.QUERIES["q08_customers_without_orders"](spark, sf).select(
        F.lit("q08_inactive").alias("fam"),
        F.col("c_mktsegment").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("n_inactive").alias("n"),
    )
    return a.unionByName(b).unionByName(c)


# q05/q07/q09: broadcast-dimension joins — (fam, k, v, n)
@q(
    "q05_dim_join_suite",
    oracle=f"""
SELECT 'q05_asia_revenue' AS fam, n_name AS k, revenue AS v, 0 AS n
FROM {_sub(tpch, "q05_local_supplier")} _a
UNION ALL
SELECT 'q07_brand_price', p_brand, avg_price, n FROM {_sub(tpch, "q07_brand_price")} _b
UNION ALL
SELECT 'q09_shipped_parts', p_brand, 0.0, n_parts
FROM {_sub(tpch, "q09_shipped_parts")} _c
UNION ALL
SELECT 'q49_salted', skew_key || '#' || attr, qty, n_items
FROM {_sub(analytics_ext, "q49_salted_skew_join")} _d
""",
)
def q05_suite(spark, sf):
    """q05 multi-dim broadcast join + q07 brand averages + q09 shipped
    parts semi-join + the salted skew join rolled to key grain (q49:
    k = skew_key#attr, v = exact-decimal quantity, n = items — the
    DuckDB side runs the UNSALTED join, pinning salt neutrality),
    tagged-unioned."""
    a = tpch.QUERIES["q05_local_supplier"](spark, sf).select(
        F.lit("q05_asia_revenue").alias("fam"),
        F.col("n_name").alias("k"),
        F.col("revenue").alias("v"),
        F.lit(0).cast("long").alias("n"),
    )
    b = tpch.QUERIES["q07_brand_price"](spark, sf).select(
        F.lit("q07_brand_price").alias("fam"),
        F.col("p_brand").alias("k"),
        F.col("avg_price").alias("v"),
        F.col("n"),
    )
    c = tpch.QUERIES["q09_shipped_parts"](spark, sf).select(
        F.lit("q09_shipped_parts").alias("fam"),
        F.col("p_brand").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("n_parts").alias("n"),
    )
    d = analytics_ext.QUERIES["q49_salted_skew_join"](spark, sf).select(
        F.lit("q49_salted").alias("fam"),
        F.concat_ws("#", "skew_key", "attr").alias("k"),
        F.col("qty").alias("v"),
        F.col("n_items").alias("n"),
    )
    return a.unionByName(b).unionByName(c).unionByName(d)


# ============================================================= windows
# q12 top-3-per-group + q15 mode — (fam, k, k2, k3, v, s)
@q(
    "q12_rank_mode_suite",
    oracle=f"""
SELECT 'q12_top3' AS fam, l_returnflag AS k, l_orderkey AS k2,
       l_linenumber AS k3, l_extendedprice AS v, '' AS s
FROM {_sub(windows, "q12_top3_per_group")} _a
UNION ALL
SELECT 'q15_mode', o_orderstatus, 0, 0, 0.0, mode_priority
FROM {_sub(windows, "q15_mode_priority")} _b
""",
)
def q12_suite(spark, sf):
    """q12 top-3 per group (row_number window) + q15 mode/most_common,
    tagged-unioned."""
    a = windows.QUERIES["q12_top3_per_group"](spark, sf).select(
        F.lit("q12_top3").alias("fam"),
        F.col("l_returnflag").alias("k"),
        F.col("l_orderkey").cast("long").alias("k2"),
        F.col("l_linenumber").cast("long").alias("k3"),
        F.col("l_extendedprice").alias("v"),
        F.lit("").alias("s"),
    )
    b = windows.QUERIES["q15_mode_priority"](spark, sf).select(
        F.lit("q15_mode").alias("fam"),
        F.col("o_orderstatus").alias("k"),
        F.lit(0).cast("long").alias("k2"),
        F.lit(0).cast("long").alias("k3"),
        F.lit(0.0).alias("v"),
        F.col("mode_priority").alias("s"),
    )
    return a.unionByName(b)


# q13 sessionization + q16 zebra alternations + q18 median gaps — all
# one row per user_id -> wide join
@q(
    "q13_event_user_suite",
    oracle=f"""
SELECT a.user_id, a.n_sessions, a.n_events,
       CAST(b.n_alternations AS BIGINT) AS n_alternations,
       c.median_gap_us, c.n_gaps,
       d.funnel_depth, d.signup_ts, d.first_view_ts, d.first_click_ts,
       d.first_purchase_ts, d.funnel_lag_us
FROM {_sub(windows, "q13_sessionize_events")} a
JOIN {_sub(windows, "q16_zebra_alternations")} b ON b.user_id = a.user_id
JOIN {_sub(windows, "q18_median_event_gap")} c ON c.user_id = a.user_id
JOIN {_sub(windows, "q44_event_funnel")} d ON d.user_id = a.user_id
""",
)
def q13_suite(spark, sf):
    """Per-user event-stream window suite: gap sessionization (q13, the
    y-clustering pattern), zebra alternation count (q16), median-gap
    adaptive threshold (q18), and the ordered conversion funnel (q44:
    signup -> view -> click -> purchase first-touch stage timestamps,
    depth, and end-to-end lag) — one row per user, joined on user_id."""
    a = windows.QUERIES["q13_sessionize_events"](spark, sf)
    b = windows.QUERIES["q16_zebra_alternations"](spark, sf)
    c = windows.QUERIES["q18_median_event_gap"](spark, sf)
    d = windows.QUERIES["q44_event_funnel"](spark, sf)
    return a.join(b, "user_id").join(c, "user_id").join(d, "user_id")


# q37 tumbling + q40 sliding event-time windows — tagged union
@q(
    "q37_event_windows_suite",
    oracle=f"""
SELECT 'q37_tumbling' AS fam, window_start, key, n_events, sum_value
FROM {_sub(windows, "q37_event_time_windows")} _a
UNION ALL
SELECT 'q40_sliding', window_start, key, n_events, 0.0
FROM {_sub(windows, "q40_sliding_windows")} _b
UNION ALL
SELECT 'q41_asof', last_purchase_ts, CAST(event_id AS VARCHAR),
       gap_us, last_purchase_value
FROM {_sub(windows, "q41_asof_join")} _c
UNION ALL
SELECT 'q42_rollup', bucket, grain || '#' || event_type,
       n_events, CAST(sum_cents AS DOUBLE)
FROM {_sub(windows, "q42_time_rollup")} _d
UNION ALL
SELECT 'q43_range', start_ts,
       promo_id || '#' || n_users || '#' || n_purchases,
       n_events, CAST(sum_cents AS DOUBLE)
FROM {_sub(windows, "q43_range_join")} _e
UNION ALL
SELECT 'q45_cohort',
       TIMESTAMP '1970-01-01' + INTERVAL (cohort_wk * 7) DAY,
       offset_wk || '#' || n_cohort,
       n_active, CAST(retention_ppm AS DOUBLE)
FROM {_sub(windows, "q45_cohort_retention")} _f
UNION ALL
SELECT 'q46_lift', TIMESTAMP '1970-01-01',
       item_a || '#' || item_b || '#' || n_a || '#' || n_b,
       support, CAST(lift_ppm AS DOUBLE)
FROM {_sub(analytics_ext, "q46_copurchase_lift")} _g
UNION ALL
SELECT 'q47_attrib', purchase_ts,
       user_id || '#' || click_id || '#' || purchase_id, lag_us, 0.0
FROM {_sub(windows, "q47_click_attribution")} _h
UNION ALL
SELECT 'q55_pattern', TIMESTAMP '1970-01-01',
       CAST(user_id AS VARCHAR), n_matches,
       CAST(first_match_event_id AS DOUBLE)
FROM {_sub(windows, "q55_sequence_pattern")} _i
""",
)
def q37_suite(spark, sf):
    """Event-time windowed aggregation suite: 10-min tumbling (q37) +
    10/5-min sliding (q40), both sharing streaming/windows.py with the
    Structured Streaming path, + the as-of join (q41: per event, the
    latest same-user purchase at-or-before — window_start carries the
    matched purchase ts, key the event id, n_events the gap in
    microseconds, sum_value the matched value), + the hierarchical
    time rollup (q42: hour/day/month/all grains in one GROUPING-SETS
    pass; key = grain#event_type, sum_value = integer cents), + the
    bucketed range join (q43: events → overlapping promo windows;
    key = promo#users#purchases, sum_value = attributed cents), + the
    weekly cohort-retention triangle (q45: window_start = cohort week
    as a timestamp, key = offset#cohort_size, n_events = active users,
    sum_value = retention in ppm), + market-basket co-occurrence (q46:
    key = item pair + per-item counts, n_events = support, sum_value =
    integer-ppm lift), + click->purchase interval-join attribution
    (q47, the stream-stream join's batch twin: key = user#click#
    purchase, n_events = lag in microseconds), + MATCH_RECOGNIZE-gap
    sequence detection (q55: key = user, n_events = view->click->
    purchase run count, sum_value = first matching purchase id)."""
    a = windows.QUERIES["q37_event_time_windows"](spark, sf).select(
        F.lit("q37_tumbling").alias("fam"),
        "window_start",
        "key",
        "n_events",
        "sum_value",
    )
    b = windows.QUERIES["q40_sliding_windows"](spark, sf).select(
        F.lit("q40_sliding").alias("fam"),
        "window_start",
        "key",
        "n_events",
        F.lit(0.0).alias("sum_value"),
    )
    c = windows.QUERIES["q41_asof_join"](spark, sf).select(
        F.lit("q41_asof").alias("fam"),
        F.col("last_purchase_ts").alias("window_start"),
        F.col("event_id").cast("string").alias("key"),
        F.col("gap_us").alias("n_events"),
        F.col("last_purchase_value").alias("sum_value"),
    )
    d = windows.QUERIES["q42_time_rollup"](spark, sf).select(
        F.lit("q42_rollup").alias("fam"),
        F.col("bucket").alias("window_start"),
        F.concat_ws("#", "grain", "event_type").alias("key"),
        F.col("n_events"),
        F.col("sum_cents").cast("double").alias("sum_value"),
    )
    e = windows.QUERIES["q43_range_join"](spark, sf).select(
        F.lit("q43_range").alias("fam"),
        F.col("start_ts").alias("window_start"),
        F.concat_ws("#", "promo_id", "n_users", "n_purchases").alias(
            "key"
        ),
        F.col("n_events"),
        F.col("sum_cents").cast("double").alias("sum_value"),
    )
    f = windows.QUERIES["q45_cohort_retention"](spark, sf).select(
        F.lit("q45_cohort").alias("fam"),
        F.timestamp_add(
            "DAY",
            (F.col("cohort_wk") * 7).cast("int"),
            F.lit("1970-01-01").cast("timestamp_ntz"),
        ).alias("window_start"),
        F.concat_ws("#", "offset_wk", "n_cohort").alias("key"),
        F.col("n_active").alias("n_events"),
        F.col("retention_ppm").cast("double").alias("sum_value"),
    )
    g = analytics_ext.QUERIES["q46_copurchase_lift"](spark, sf).select(
        F.lit("q46_lift").alias("fam"),
        F.lit("1970-01-01").cast("timestamp_ntz").alias("window_start"),
        F.concat_ws("#", "item_a", "item_b", "n_a", "n_b").alias("key"),
        F.col("support").alias("n_events"),
        F.col("lift_ppm").cast("double").alias("sum_value"),
    )
    h = windows.QUERIES["q47_click_attribution"](spark, sf).select(
        F.lit("q47_attrib").alias("fam"),
        F.col("purchase_ts").alias("window_start"),
        F.concat_ws("#", "user_id", "click_id", "purchase_id").alias(
            "key"
        ),
        F.col("lag_us").alias("n_events"),
        F.lit(0.0).alias("sum_value"),
    )
    i = windows.QUERIES["q55_sequence_pattern"](spark, sf).select(
        F.lit("q55_pattern").alias("fam"),
        F.lit("1970-01-01").cast("timestamp_ntz").alias("window_start"),
        F.col("user_id").cast("string").alias("key"),
        F.col("n_matches").cast("long").alias("n_events"),
        F.col("first_match_event_id").cast("double").alias("sum_value"),
    )
    return (
        a.unionByName(b)
        .unionByName(c)
        .unionByName(d)
        .unionByName(e)
        .unionByName(f)
        .unionByName(g)
        .unionByName(h)
        .unionByName(i)
    )


# ============================================================== setops
@q(
    "q19_setops_suite",
    oracle=f"""
SELECT 'q19_union_nations' AS fam, CAST(nationkey AS VARCHAR) AS key
FROM {_sub(setops_arrays, "q19_union_distinct_nations")} _a
UNION ALL
SELECT 'q20_intersect_brands', brand FROM {_sub(setops_arrays, "q20_intersect_brands")} _b
UNION ALL
SELECT 'q21_except_brands', brand FROM {_sub(setops_arrays, "q21_except_brands")} _c
""",
)
def q19_suite(spark, sf):
    """Set-operation suite: union-distinct (q19), intersect (q20),
    except (q21), tagged-unioned."""
    a = setops_arrays.QUERIES["q19_union_distinct_nations"](spark, sf).select(
        F.lit("q19_union_nations").alias("fam"),
        F.col("nationkey").cast("string").alias("key"),
    )
    b = setops_arrays.QUERIES["q20_intersect_brands"](spark, sf).select(
        F.lit("q20_intersect_brands").alias("fam"), F.col("brand").alias("key")
    )
    c = setops_arrays.QUERIES["q21_except_brands"](spark, sf).select(
        F.lit("q21_except_brands").alias("fam"), F.col("brand").alias("key")
    )
    return a.unionByName(b).unionByName(c)


# =========================================================== functions
# q28 lattice counts + q38 column type profile
@q(
    "q28_cell_type_suite",
    oracle=f"""
SELECT 'q38_profile' AS fam, col_name, predominant_type AS cell_type,
       n_cells, n_distinct, is_enum
FROM {_sub(functions_q, "q38_column_type_profile")} _a
UNION ALL
SELECT 'q28_lattice', '', cell_type, n, 0, false
FROM {_sub(functions_q, "q28_cell_type_lattice")} _b
""",
)
def q28_suite(spark, sf):
    """Cell-type suite: TH1 lattice counts (q28) + TH3 per-column
    predominant-type/ENUM profile (q38)."""
    a = functions_q.QUERIES["q38_column_type_profile"](spark, sf).select(
        F.lit("q38_profile").alias("fam"),
        "col_name",
        F.col("predominant_type").alias("cell_type"),
        "n_cells",
        "n_distinct",
        "is_enum",
    )
    b = functions_q.QUERIES["q28_cell_type_lattice"](spark, sf).select(
        F.lit("q28_lattice").alias("fam"),
        F.lit("").alias("col_name"),
        "cell_type",
        F.col("n").alias("n_cells"),
        F.lit(0).cast("long").alias("n_distinct"),
        F.lit(False).alias("is_enum"),
    )
    return a.unionByName(b)


# q29 coercion / q31 levenshtein / q32 regex / q33 json / q34 case
@q(
    "q29_scalar_suite",
    oracle=f"""
SELECT 'q29_coerce' AS fam, 'all' AS k, total_coerced AS v,
       n AS b1, 0 AS b2
FROM {_sub(functions_q, "q29_number_coercion")} _a
UNION ALL
SELECT 'q31_lev', c_mktsegment, 0.0, min_dist, max_dist
FROM {_sub(functions_q, "q31_levenshtein")} _b
UNION ALL
SELECT 'q32_regex', c_mktsegment, 0.0, id_sum, n
FROM {_sub(functions_q, "q32_regex_extract_ids")} _c
UNION ALL
SELECT 'q33_json', event_type, 0.0, k_sum, n
FROM {_sub(functions_q, "q33_json_props")} _d
UNION ALL
SELECT 'q34_strfmt', up || '|' || lo || '|' || snake, 0.0, n, 0
FROM {_sub(functions_q, "q34_string_formats")} _e
""",
)
def q29_suite(spark, sf):
    """Scalar-function suite: number coercion (q29), levenshtein (q31),
    regexp_extract sums (q32), per-row JSON (q33), case formats (q34)."""
    a = functions_q.QUERIES["q29_number_coercion"](spark, sf).select(
        F.lit("q29_coerce").alias("fam"),
        F.lit("all").alias("k"),
        F.col("total_coerced").alias("v"),
        F.col("n").alias("b1"),
        F.lit(0).cast("long").alias("b2"),
    )
    b = functions_q.QUERIES["q31_levenshtein"](spark, sf).select(
        F.lit("q31_lev").alias("fam"),
        F.col("c_mktsegment").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("min_dist").cast("long").alias("b1"),
        F.col("max_dist").cast("long").alias("b2"),
    )
    c = functions_q.QUERIES["q32_regex_extract_ids"](spark, sf).select(
        F.lit("q32_regex").alias("fam"),
        F.col("c_mktsegment").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("id_sum").alias("b1"),
        F.col("n").alias("b2"),
    )
    d = functions_q.QUERIES["q33_json_props"](spark, sf).select(
        F.lit("q33_json").alias("fam"),
        F.col("event_type").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("k_sum").alias("b1"),
        F.col("n").alias("b2"),
    )
    e = functions_q.QUERIES["q34_string_formats"](spark, sf).select(
        F.lit("q34_strfmt").alias("fam"),
        F.concat_ws("|", "up", "lo", "snake").alias("k"),
        F.lit(0.0).alias("v"),
        F.col("n").alias("b1"),
        F.lit(0).cast("long").alias("b2"),
    )
    return a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)


# ========================================================== similarity
@q(
    "s01_similarity_suite",
    oracle=f"""
SELECT 'bf_topk' AS fam, vec_id AS id, 0 AS aux1, 0 AS aux2,
       cosine AS score
FROM {_sub(similarity, "s01_ann_bruteforce_topk")} _a
UNION ALL
SELECT 'lsh_bucket', vec_id, bucket, 0, cosine
FROM {_sub(similarity, "s02_ann_lsh_bucket")} _b
UNION ALL
SELECT 'ivf_centroid', CAST(label AS BIGINT), pos, 0, centroid
FROM {_sub(similarity, "s03_ivf_centroids")} _c
UNION ALL
SELECT 'ivf_probe', vec_id, CAST(label AS BIGINT), 0, cosine
FROM {_sub(similarity, "s04_ivf_probe_topk")} _d
UNION ALL
SELECT 'knn_join', vec_id, qid, rk, cosine
FROM {_sub(similarity, "s05_knn_join")} _e
UNION ALL
SELECT 'semdedup', vec_id, CAST(cluster AS BIGINT), dup_of, cosine
FROM {_sub(similarity, "s06_semdedup")} _f
UNION ALL
SELECT 'sq8', vec_id, q_sum, 0, max_err
FROM {_sub(similarity, "s07_int8_quantize")} _g
UNION ALL
SELECT 'kmeans', vec_id, CAST(cluster AS BIGINT),
       CAST(cluster_it1 AS BIGINT), dist2
FROM {_sub(similarity, "s08_kmeans")} _h
UNION ALL
SELECT 'ann_recall', qid, CAST(n_cand AS BIGINT), CAST(n_hit AS BIGINT),
       recall
FROM {_sub(similarity, "s09_ann_recall")} _i
UNION ALL
SELECT 'pq', vec_id,
       CAST(code0 * 4096 + code1 * 256 + code2 * 16 + code3 AS BIGINT),
       0, adc
FROM {_sub(similarity, "s10_product_quantize")} _j
UNION ALL
SELECT 'ivfpq', vec_id, CAST(label AS BIGINT), CAST(rk AS BIGINT), adc
FROM {_sub(similarity, "s11_ivfpq_search")} _k
UNION ALL
SELECT 'hybrid', doc_id, CAST(lex_rank AS BIGINT),
       CAST(vec_rank AS BIGINT), CAST(rrf_micro AS DOUBLE)
FROM {_sub(similarity, "s12_hybrid_rrf")} _l
UNION ALL
SELECT 'kcenter', vec_id, CAST(sel_round AS BIGINT),
       radius_micro, CAST(dmin_micro AS DOUBLE)
FROM {_sub(similarity, "s13_kcenter_coreset")} _m
UNION ALL
SELECT 'mrl', vec_id, 0, 0, cosine
FROM {_sub(similarity, "s14_mrl_rerank")} _n
UNION ALL
SELECT 'maxsim', doc_id, CAST(m0 AS BIGINT), CAST(m1 AS BIGINT),
       CAST(maxsim AS DOUBLE)
FROM {_sub(similarity, "s15_colbert_maxsim")} _o
UNION ALL
SELECT 'bitext', src_id, tgt_id,
       CAST(CASE WHEN accept THEN 1 ELSE 0 END AS BIGINT), margin
FROM {_sub(similarity, "s16_bitext_margin")} _p
UNION ALL
SELECT 'graph_beam', qid, vec_id, CAST(rank AS BIGINT), cosine
FROM {_sub(similarity, "s17_graph_beam_search")} _q
UNION ALL
SELECT 'ir_metrics', qid, ndcg_ppm, rr_micro,
       CAST(dcg_micro AS DOUBLE)
FROM {_sub(similarity, "s18_retrieval_metrics")} _r
UNION ALL
SELECT 'silhouette', vec_id, CAST(cluster AS BIGINT),
       CAST(nearest_other AS BIGINT), CAST(sil_micro AS DOUBLE)
FROM {_sub(similarity, "s19_silhouette")} _s
UNION ALL
SELECT 'mips', qid, vec_id,
       CAST(dot_rank * 100 + aug_rank AS BIGINT), dot
FROM {_sub(similarity, "s20_mips_norm_augment")} _t
UNION ALL
SELECT 'jl', id_a, id_b, distortion_milli, est_d2
FROM {_sub(similarity, "s21_jl_projection")} _u
UNION ALL
SELECT 'ari', CAST(label AS BIGINT), CAST(cluster AS BIGINT),
       ari_micro, CAST(n_ij AS DOUBLE)
FROM {_sub(similarity, "s22_cluster_stability")} _v
UNION ALL
SELECT 'nprobe', qid, CAST(nprobe AS BIGINT), recall_ppm,
       CAST(n_reachable AS DOUBLE)
FROM {_sub(similarity, "s23_ivf_probe_sweep")} _w
""",
)
def s01_suite(spark, sf):
    """ANN suite: brute-force baseline (s01), LSH bucket probe (s02),
    IVF centroid build (s03) + probe (s04), batched KNN join (s05),
    cluster-blocked semantic dedup (s06, SemDeDup: aux1 = cluster,
    aux2 = the survivor the vector duplicates), and int8 scalar
    quantization (s07: aux1 = quantized-code checksum, score = max
    reconstruction error; the full code array is gated in the
    fine-grained s07 query), and two unrolled Lloyd iterations of
    k-means (s08: aux1 = final cluster, aux2 = iteration-1 cluster,
    score = final squared distance), and the recall@10 ANN quality
    audit (s09: id = query, aux1 = bucket candidates, aux2 = true
    neighbors hit, score = recall), and PQ encode + ADC scoring
    (s10: aux1 = the packed 4x4-bit code, score = asymmetric distance
    to the sample query; recon error rides the fine-grained twin), and
    the composed IVF-PQ search path (s11: coarse-route then ADC-rank
    the routed cell only; aux1 = cell label, aux2 = rank), and hybrid
    BM25+vector retrieval fused by Reciprocal Rank Fusion (s12: aux1 =
    lexical rank, aux2 = vector rank, -1 = not retrieved by that arm,
    score = integer-micro RRF), and greedy k-center coreset selection
    (s13: aux1 = selection round or -1, aux2 = the pinned global
    coverage radius, score = final micro distance to the selected
    set), and Matryoshka two-stage search (s14: prefix-dim coarse
    pass -> shortlist -> full-dim re-rank; score = final cosine; the
    coarse score rides the fine-grained twin), and ColBERT MaxSim
    late-interaction scoring (s15: aux1/aux2 = the first two
    per-query-token maxima, score = the MaxSim sum; all four maxima
    ride the fine-grained twin), and margin-based bitext mining (s16:
    aux1 = the mined target, aux2 = the accept flag, score = the k=1
    margin ratio), and graph-navigation ANN (s17: NSW beam search
    over the LSH-seeded NN-descent kNN graph; aux1 = the retrieved
    vector, aux2 =
    its rank, score = cosine), and the rank-aware retrieval-quality
    audit (s18: nDCG@5 + MRR of s17's ranking vs the exact one;
    aux1 = ppm nDCG, aux2 = micro RR, score = micro DCG), and the
    silhouette clustering audit (s19: aux1 = cluster, aux2 = nearest
    other cluster, score = micro silhouette), and MIPS via norm
    augmentation (s20: aux1 = the retrieved item, aux2 = dot rank x
    100 + augmented-cosine rank — equal digits being the reduction
    theorem, score = the raw inner product), and the JL projection
    audit (s21: aux1 = the pair's other end, aux2 = milli
    distortion, score = estimated d^2), and the cluster-stability
    audit (s22: label-vs-kmeans contingency; aux2 = the exact
    integer-micro Adjusted Rand Index, score = cell count), and the
    IVF nprobe tuning sweep (s23: aux1 = probe budget, aux2 = ppm
    recall of the exact top-5, score = vectors reachable) —
    tagged union on (fam, id, aux1, aux2, score)."""
    a = similarity.QUERIES["s01_ann_bruteforce_topk"](spark, sf).select(
        F.lit("bf_topk").alias("fam"),
        F.col("vec_id").alias("id"),
        F.lit(0).cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    b = similarity.QUERIES["s02_ann_lsh_bucket"](spark, sf).select(
        F.lit("lsh_bucket").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("bucket").cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    c = similarity.QUERIES["s03_ivf_centroids"](spark, sf).select(
        F.lit("ivf_centroid").alias("fam"),
        F.col("label").cast("long").alias("id"),
        F.col("pos").cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("centroid").alias("score"),
    )
    d = similarity.QUERIES["s04_ivf_probe_topk"](spark, sf).select(
        F.lit("ivf_probe").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("label").cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    e = similarity.QUERIES["s05_knn_join"](spark, sf).select(
        F.lit("knn_join").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("qid").cast("long").alias("aux1"),
        F.col("rk").cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    f = similarity.QUERIES["s06_semdedup"](spark, sf).select(
        F.lit("semdedup").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("cluster").cast("long").alias("aux1"),
        F.col("dup_of").cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    g = similarity.QUERIES["s07_int8_quantize"](spark, sf).select(
        F.lit("sq8").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("q_sum").cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("max_err").alias("score"),
    )
    s08_df = similarity.QUERIES["s08_kmeans"](spark, sf).persist()
    h = s08_df.select(
        F.lit("kmeans").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("cluster").cast("long").alias("aux1"),
        F.col("cluster_it1").cast("long").alias("aux2"),
        F.col("dist2").alias("score"),
    )
    i = similarity.QUERIES["s09_ann_recall"](spark, sf).select(
        F.lit("ann_recall").alias("fam"),
        F.col("qid").alias("id"),
        F.col("n_cand").cast("long").alias("aux1"),
        F.col("n_hit").cast("long").alias("aux2"),
        F.col("recall").alias("score"),
    )
    j = similarity.QUERIES["s10_product_quantize"](spark, sf).select(
        F.lit("pq").alias("fam"),
        F.col("vec_id").alias("id"),
        (
            F.col("code0") * 4096 + F.col("code1") * 256
            + F.col("code2") * 16 + F.col("code3")
        ).cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("adc").alias("score"),
    )
    k = similarity.QUERIES["s11_ivfpq_search"](spark, sf).select(
        F.lit("ivfpq").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("label").cast("long").alias("aux1"),
        F.col("rk").cast("long").alias("aux2"),
        F.col("adc").alias("score"),
    )
    ll = similarity.QUERIES["s12_hybrid_rrf"](spark, sf).select(
        F.lit("hybrid").alias("fam"),
        F.col("doc_id").alias("id"),
        F.col("lex_rank").cast("long").alias("aux1"),
        F.col("vec_rank").cast("long").alias("aux2"),
        F.col("rrf_micro").cast("double").alias("score"),
    )
    m = similarity.QUERIES["s13_kcenter_coreset"](spark, sf).select(
        F.lit("kcenter").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("sel_round").cast("long").alias("aux1"),
        F.col("radius_micro").alias("aux2"),
        F.col("dmin_micro").cast("double").alias("score"),
    )
    n = similarity.QUERIES["s14_mrl_rerank"](spark, sf).select(
        F.lit("mrl").alias("fam"),
        F.col("vec_id").alias("id"),
        F.lit(0).cast("long").alias("aux1"),
        F.lit(0).cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    o = similarity.QUERIES["s15_colbert_maxsim"](spark, sf).select(
        F.lit("maxsim").alias("fam"),
        F.col("doc_id").alias("id"),
        F.col("m0").cast("long").alias("aux1"),
        F.col("m1").cast("long").alias("aux2"),
        F.col("maxsim").cast("double").alias("score"),
    )
    p = similarity.QUERIES["s16_bitext_margin"](spark, sf).select(
        F.lit("bitext").alias("fam"),
        F.col("src_id").alias("id"),
        F.col("tgt_id").cast("long").alias("aux1"),
        F.when(F.col("accept"), 1).otherwise(0).cast("long").alias(
            "aux2"
        ),
        F.col("margin").cast("double").alias("score"),
    )
    s17_df = similarity.QUERIES["s17_graph_beam_search"](
        spark, sf
    ).persist()
    qgb = s17_df.select(
        F.lit("graph_beam").alias("fam"),
        F.col("qid").alias("id"),
        F.col("vec_id").cast("long").alias("aux1"),
        F.col("rank").cast("long").alias("aux2"),
        F.col("cosine").alias("score"),
    )
    rim = similarity.QUERIES["s18_retrieval_metrics"](
        spark, sf, s17_df
    ).select(
        F.lit("ir_metrics").alias("fam"),
        F.col("qid").alias("id"),
        F.col("ndcg_ppm").cast("long").alias("aux1"),
        F.col("rr_micro").cast("long").alias("aux2"),
        F.col("dcg_micro").cast("double").alias("score"),
    )
    sil = similarity.QUERIES["s19_silhouette"](spark, sf).select(
        F.lit("silhouette").alias("fam"),
        F.col("vec_id").alias("id"),
        F.col("cluster").cast("long").alias("aux1"),
        F.col("nearest_other").cast("long").alias("aux2"),
        F.col("sil_micro").cast("double").alias("score"),
    )
    mip = similarity.QUERIES["s20_mips_norm_augment"](spark, sf).select(
        F.lit("mips").alias("fam"),
        F.col("qid").alias("id"),
        F.col("vec_id").cast("long").alias("aux1"),
        (F.col("dot_rank") * 100 + F.col("aug_rank"))
        .cast("long")
        .alias("aux2"),
        F.col("dot").alias("score"),
    )
    jl = similarity.QUERIES["s21_jl_projection"](spark, sf).select(
        F.lit("jl").alias("fam"),
        F.col("id_a").alias("id"),
        F.col("id_b").cast("long").alias("aux1"),
        F.col("distortion_milli").cast("long").alias("aux2"),
        F.col("est_d2").alias("score"),
    )
    ari = similarity.QUERIES["s22_cluster_stability"](
        spark, sf, s08_df
    ).select(
        F.lit("ari").alias("fam"),
        F.col("label").cast("long").alias("id"),
        F.col("cluster").cast("long").alias("aux1"),
        F.col("ari_micro").cast("long").alias("aux2"),
        F.col("n_ij").cast("double").alias("score"),
    )
    npb = similarity.QUERIES["s23_ivf_probe_sweep"](spark, sf).select(
        F.lit("nprobe").alias("fam"),
        F.col("qid").alias("id"),
        F.col("nprobe").cast("long").alias("aux1"),
        F.col("recall_ppm").cast("long").alias("aux2"),
        F.col("n_reachable").cast("double").alias("score"),
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d)
        .unionByName(e).unionByName(f).unionByName(g)
        .unionByName(h).unionByName(i).unionByName(j)
        .unionByName(k).unionByName(ll).unionByName(m)
        .unionByName(n).unionByName(o).unionByName(p)
        .unionByName(qgb).unionByName(rim).unionByName(sil)
        .unionByName(mip).unionByName(jl).unionByName(ari)
        .unionByName(npb)
    )


# =============================================================== dedup
@q(
    "d06_simhash_suite",
    oracle=f"""
SELECT 'd06' AS fam, doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming,
       '' AS txt
FROM {_sub(dedup, "d06_simhash_bucketed")} _a
UNION ALL
SELECT 'd07' AS fam, doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming,
       '' AS txt
FROM {_sub(dedup, "d07_simhash_wide")} _b
UNION ALL
SELECT 'd08' AS fam, doc_id AS doc_a, CAST(-1 AS BIGINT) AS doc_b,
       CAST(n_hits AS INTEGER) AS hamming, '' AS txt
FROM {_sub(dedup, "d08_decontaminate")} _c
UNION ALL
SELECT 'd09' AS fam, doc_id AS doc_a, CAST(n_lines AS BIGINT) AS doc_b,
       CAST(n_boiler AS INTEGER) AS hamming, clean_text AS txt
FROM {_sub(dedup, "d09_line_dedup")} _d
UNION ALL
SELECT 'd10' AS fam, doc_id AS doc_a, CAST(n_cut_words AS BIGINT) AS doc_b,
       CAST(n_dup_occ AS INTEGER) AS hamming, clean_text AS txt
FROM {_sub(dedup, "d10_substring_dedup")} _e
UNION ALL
SELECT 'd11' AS fam, doc_id AS doc_a, holder AS doc_b,
       CAST(CASE verdict WHEN 'kept' THEN 0
            WHEN 'dup_prior' THEN 1 ELSE 2 END AS INTEGER) AS hamming,
       content_key AS txt
FROM {_sub(dedup, "d11_incremental_dedup")} _f
UNION ALL
SELECT 'd12' AS fam, doc_id AS doc_a, component AS doc_b,
       CAST(csize AS INTEGER) AS hamming,
       CASE WHEN keep THEN 'keep' ELSE 'dup' END AS txt
FROM {_sub(dedup, "d12_fuzzy_dedup_funnel")} _g
UNION ALL
SELECT 'd13' AS fam, doc_id AS doc_a, holder AS doc_b,
       CAST(best_jac_milli AS INTEGER) AS hamming, verdict AS txt
FROM {_sub(dedup, "d13_incremental_lsh")} _h
UNION ALL
SELECT 'd14' AS fam, doc_a, doc_b,
       CAST(jac_milli AS INTEGER) AS hamming,
       CASE WHEN is_truth AND is_cand THEN 'hit'
            WHEN is_truth THEN 'miss' ELSE 'fp' END AS txt
FROM {_sub(dedup, "d14_lsh_quality")} _i
UNION ALL
SELECT 'd15' AS fam, doc_a, doc_b,
       CAST(n_agree AS INTEGER) AS hamming,
       CAST(est_milli AS VARCHAR) || '#' || CAST(jac_milli AS VARCHAR)
         || '#' || CAST(err_milli AS VARCHAR) AS txt
FROM {_sub(dedup, "d15_bbit_minhash")} _j
""",
)
def d06_suite(spark, sf):
    """SimHash bucketed-dedup suite (tagged union): the 16-bit 4x4-block
    variant (d06, shares d03's all-pairs oracle result set), the
    production 64-bit 4x16-block variant (d07) — both pigeonhole
    (block_idx, block_value) equi-joins, no all-pairs stage anywhere —
    benchmark decontamination (d08: broadcast 8-gram overlap against a
    deterministic eval set; doc_b = -1, hamming = n-gram hit count),
    line-level boilerplate dedup (d09: doc_b = line count, hamming =
    boilerplate lines stripped, txt = cleaned text), and substring-
    level exact dedup (d10, Lee et al. 2022 ExactSubstr: doc_b = words
    cut, hamming = duplicate window occurrences removed, txt = cleaned
    text), and incremental snapshot-vs-index dedup (d11: doc_b = the
    canonical holder, hamming = verdict code 0 kept / 1 dup_prior /
    2 dup_batch, txt = content key), and the end-to-end fuzzy-dedup
    funnel (d12: LSH -> verified pairs -> connected components ->
    canonical survivor; doc_b = component, hamming = cluster size,
    txt = keep/dup verdict), and incremental LSH dedup (d13: new
    batch vs the prior snapshot's materialized band index; doc_b =
    holder, hamming = best milli Jaccard, txt = the
    dup_prior/dup_batch/kept verdict), and the LSH quality audit
    (d14: banded candidates vs exact-Jaccard truth per pair;
    hamming = milli Jaccard, txt = hit/miss/fp — the banding
    S-curve read off real data)."""
    d6 = dedup.QUERIES["d06_simhash_bucketed"](spark, sf).select(
        F.lit("d06").alias("fam"), "doc_a", "doc_b",
        F.col("hamming").cast("int").alias("hamming"),
        F.lit("").alias("txt"),
    )
    d7 = dedup.QUERIES["d07_simhash_wide"](spark, sf).select(
        F.lit("d07").alias("fam"), "doc_a", "doc_b",
        F.col("hamming").cast("int").alias("hamming"),
        F.lit("").alias("txt"),
    )
    d8 = dedup.QUERIES["d08_decontaminate"](spark, sf).select(
        F.lit("d08").alias("fam"),
        F.col("doc_id").alias("doc_a"),
        F.lit(-1).cast("bigint").alias("doc_b"),
        F.col("n_hits").cast("int").alias("hamming"),
        F.lit("").alias("txt"),
    )
    d9 = dedup.QUERIES["d09_line_dedup"](spark, sf).select(
        F.lit("d09").alias("fam"),
        F.col("doc_id").alias("doc_a"),
        F.col("n_lines").cast("bigint").alias("doc_b"),
        F.col("n_boiler").cast("int").alias("hamming"),
        F.col("clean_text").alias("txt"),
    )
    d10 = dedup.QUERIES["d10_substring_dedup"](spark, sf).select(
        F.lit("d10").alias("fam"),
        F.col("doc_id").alias("doc_a"),
        F.col("n_cut_words").cast("bigint").alias("doc_b"),
        F.col("n_dup_occ").cast("int").alias("hamming"),
        F.col("clean_text").alias("txt"),
    )
    d11 = dedup.QUERIES["d11_incremental_dedup"](spark, sf).select(
        F.lit("d11").alias("fam"),
        F.col("doc_id").alias("doc_a"),
        F.col("holder").alias("doc_b"),
        F.when(F.col("verdict") == "kept", 0)
        .when(F.col("verdict") == "dup_prior", 1)
        .otherwise(2)
        .cast("int")
        .alias("hamming"),
        F.col("content_key").alias("txt"),
    )
    d12 = dedup.QUERIES["d12_fuzzy_dedup_funnel"](spark, sf).select(
        F.lit("d12").alias("fam"),
        F.col("doc_id").alias("doc_a"),
        F.col("component").alias("doc_b"),
        F.col("csize").cast("int").alias("hamming"),
        F.when(F.col("keep"), "keep").otherwise("dup").alias("txt"),
    )
    d13 = dedup.QUERIES["d13_incremental_lsh"](spark, sf).select(
        F.lit("d13").alias("fam"),
        F.col("doc_id").alias("doc_a"),
        F.col("holder").alias("doc_b"),
        F.col("best_jac_milli").cast("int").alias("hamming"),
        F.col("verdict").alias("txt"),
    )
    d14 = dedup.QUERIES["d14_lsh_quality"](spark, sf).select(
        F.lit("d14").alias("fam"),
        "doc_a",
        "doc_b",
        F.col("jac_milli").cast("int").alias("hamming"),
        F.when(F.col("is_truth") & F.col("is_cand"), "hit")
        .when(F.col("is_truth"), "miss")
        .otherwise("fp")
        .alias("txt"),
    )
    d15 = dedup.QUERIES["d15_bbit_minhash"](spark, sf).select(
        F.lit("d15").alias("fam"),
        "doc_a",
        "doc_b",
        F.col("n_agree").cast("int").alias("hamming"),
        F.concat_ws(
            "#",
            F.col("est_milli").cast("string"),
            F.col("jac_milli").cast("string"),
            F.col("err_milli").cast("string"),
        ).alias("txt"),
    )
    return (
        d6.unionByName(d7)
        .unionByName(d8)
        .unionByName(d9)
        .unionByName(d10)
        .unionByName(d11)
        .unionByName(d12)
        .unionByName(d13)
        .unionByName(d14)
        .unionByName(d15)
    )


# ====================================================== grouping sets
@q(
    "q35_grouping_suite",
    oracle=f"""
SELECT 'rollup' AS fam, region AS k1, nation AS k2,
       CAST(-1 AS INTEGER) AS g1, CAST(-1 AS INTEGER) AS g2,
       CAST(0.0 AS DOUBLE) AS sum_qty, revenue, n_items
FROM {_sub(analytics_ext, "q35_rollup_revenue")} _r
UNION ALL
SELECT 'cube' AS fam, rf AS k1, ls AS k2, g_rf AS g1, g_ls AS g2,
       sum_qty, revenue, n_items
FROM {_sub(analytics_ext, "q50_grouping_cube")} _c
UNION ALL
SELECT 'skyline', p_brand, CAST(p_partkey AS VARCHAR),
       CAST(cents AS INTEGER), p_size,
       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(1 AS BIGINT)
FROM {_sub(analytics_ext, "q54_pareto_skyline")} _s
""",
)
def q35_suite(spark, sf):
    """Grouping-sets family as one tagged union: hierarchical ROLLUP
    revenue (q35: region -> nation -> grand total), the full CUBE
    with GROUPING flags (q50), and the per-brand Pareto skyline
    (q54: k1 = brand, k2 = partkey, g1 = price cents, g2 = size) on a
    fixed (fam, k1, k2, g1, g2, sum_qty, revenue, n_items) schema."""
    r = analytics_ext.QUERIES["q35_rollup_revenue"](spark, sf).select(
        F.lit("rollup").alias("fam"),
        F.col("region").alias("k1"),
        F.col("nation").alias("k2"),
        F.lit(-1).cast("int").alias("g1"),
        F.lit(-1).cast("int").alias("g2"),
        F.lit(0.0).cast("double").alias("sum_qty"),
        "revenue",
        "n_items",
    )
    c = analytics_ext.QUERIES["q50_grouping_cube"](spark, sf).select(
        F.lit("cube").alias("fam"),
        F.col("rf").alias("k1"),
        F.col("ls").alias("k2"),
        F.col("g_rf").alias("g1"),
        F.col("g_ls").alias("g2"),
        "sum_qty",
        "revenue",
        "n_items",
    )
    sk = analytics_ext.QUERIES["q54_pareto_skyline"](spark, sf).select(
        F.lit("skyline").alias("fam"),
        F.col("p_brand").alias("k1"),
        F.col("p_partkey").cast("string").alias("k2"),
        F.col("cents").cast("int").alias("g1"),
        F.col("p_size").cast("int").alias("g2"),
        F.lit(0.0).cast("double").alias("sum_qty"),
        F.lit(0.0).cast("double").alias("revenue"),
        F.lit(1).cast("long").alias("n_items"),
    )
    return r.unionByName(c).unionByName(sk)


# =========================================================== textstats
@q(
    "t01_text_analysis_suite",
    oracle=f"""
SELECT t1.doc_id, t1.labeled_lang, t1.pred_lang,
       t1.score_en, t1.score_de, t1.score_fr, t1.score_es,
       t2.n_chars, t2.n_tokens, t2.unique_ratio, t2.stopword_ratio,
       t2.punct_ratio, t2.digit_ratio, t2.keep,
       t3.ws_tokens, t3.bpe_tokens, t3.chars_per_token,
       t4.fingerprint,
       t7.corrupted_token, t7.repaired_token, t7.recovered_n,
       t7.recovered_ok,
       f1.header_bold_ratio, f1.data_bold_ratio, f1.n_bold_hdr_rows,
       f1.n_meta_rows, f1.n_mono_cols, f1.zebra_alt, f1.is_zebra,
       COALESCE(t8.stratum, '') AS stratum,
       CAST(COALESCE(t8.sample_rank, 0) AS INTEGER) AS sample_rank,
       CAST(COALESCE(t32.key_micro, 0) AS BIGINT) AS aes_key_micro,
       CAST(COALESCE(t32.sample_rank, 0) AS INTEGER) AS aes_rank,
       t33.n_cyr + t33.n_cjk + t33.n_greek AS scr_nonlatin,
       t33.n_confusable AS scr_confusable,
       t33.mixed_script AS scr_mixed,
       t33.script_keep AS scr_keep,
       t34.canon_url AS url_canon,
       t34.n_sharing AS url_n_sharing,
       t34.url_keeper AS url_keeper,
       t38.n_special AS spec_n,
       t38.n_kinds AS spec_kinds,
       t38.first_kind AS spec_first,
       t38.clean_hash AS spec_clean_hash,
       t38.spec_keep,
       t38.spec_deep,
       t35.cum_tok AS vg_cum_tok,
       t35.cum_vocab AS vg_cum_vocab,
       t35.n_new_types AS vg_new_types,
       t35.ttr_milli AS vg_ttr_milli,
       t9.top2_frac, t9.top3_frac, t9.dup2_frac,
       t10.n_email, t10.n_ipv4, t10.n_phone, t10.masked,
       f2.header_color, f2.visual_hdr_rows, f2.text_hdr_rows,
       f2.vh6_verdict, f2.n_exception_colors, f2.n_exception_cells,
       t11.n_words, t11.mean_word_len, t11.alpha_frac, t11.sym_ratio,
       t11.stop_hits, t11.bullet_frac, t11.ellipsis_frac,
       t11.has_lorem, t11.has_brace, t11.gopher_keep, t11.c4_keep,
       t12.n_urls, t12.domains, t12.n_blocked, t12.url_keep,
       t13.n_tok, t13.first_bin, t13.last_bin, t13.offset_in_bin,
       t14.micro_lp_sum, t14.lm_bits_per_tok, t14.ppl_bucket,
       t15.mix_rate, t15.mix_keep,
       t16.tf_spark, t16.tf_filter, t16.tf_window, t16.bm25,
       t17.n_chunks, t17.chunk_toks, t17.chunk_digest,
       t18.p25 AS len_p25, t18.p50 AS len_p50, t18.p75 AS len_p75,
       t18.p95 AS len_p95,
       t19.split, t19.n_splits, t19.leaked,
       t21.host, t21.rank2_nano AS host_rank_nano,
       t22.n_distinct_chars, t22.micro_entropy, t22.entropy_keep,
       t24.n_tokens AS enc_tokens, t24.n_distinct_tok AS enc_distinct,
       t25.n_sents AS fk_sents, t25.n_syll AS fk_syll, t25.fk_micro,
       t25.readable,
       t26.y_label AS clf_label, t26.score_micro AS clf_score,
       t26.pred_keep AS clf_keep, t26.w_uniq AS clf_w_uniq,
       t27.n_mojibake AS moj_n, t27.n_kinds AS moj_kinds,
       t27.clean AS moj_clean,
       CAST(COALESCE(t29.n_shingles, 0) AS BIGINT) AS nov_shingles,
       CAST(COALESCE(t29.n_novel, 0) AS BIGINT) AS nov_novel,
       CAST(COALESCE(t29.novelty_ppm, 1000000) AS BIGINT)
         AS novelty_ppm,
       COALESCE(t29.boilerplate, FALSE) AS nov_boiler,
       t30.n_bigrams AS dsir_bigrams,
       t30.log_iw_micro AS dsir_log_iw_micro, t30.dsir_keep,
       CAST(COALESCE(t31.n_gaps, 0) AS INTEGER) AS tt_gaps,
       CAST(COALESCE(t31.n_bounds, 0) AS INTEGER) AS tt_bounds,
       CAST(COALESCE(t31.n_bounds, 0) + 1 AS INTEGER) AS tt_segments,
       (t2.n_chars > t18.p50) AS above_median_len,
       (t2.keep = 1 AND t22.entropy_keep AND t11.c4_keep = 1
        AND t12.url_keep = 1 AND NOT COALESCE(t29.boilerplate, FALSE)
        AND t15.mix_keep) AS curation_keep,
       CASE WHEN t2.keep = 0 THEN 'quality'
            WHEN NOT t22.entropy_keep THEN 'entropy'
            WHEN t11.c4_keep = 0 THEN 'c4'
            WHEN t12.url_keep = 0 THEN 'url'
            WHEN COALESCE(t29.boilerplate, FALSE) THEN 'novelty'
            WHEN NOT t15.mix_keep THEN 'mixture'
            ELSE '' END AS first_fail
FROM {_sub(textstats, "t01_language_id")} t1
JOIN {_sub(textstats, "t02_quality_score")} t2 ON t2.doc_id = t1.doc_id
JOIN {_sub(textstats, "t03_token_counts")} t3 ON t3.doc_id = t1.doc_id
JOIN {_sub(textstats, "t04_doc_fingerprint")} t4 ON t4.doc_id = t1.doc_id
JOIN {_sub(textstats, "t07_ocr_span_recovery")} t7 ON t7.doc_id = t1.doc_id
JOIN {_sub(fonts_q, "f01_font_profile")} f1 ON f1.doc_id = t1.doc_id
LEFT JOIN {_sub(textstats, "t08_stratified_sample")} t8
       ON t8.doc_id = t1.doc_id
LEFT JOIN {_sub(textstats, "t32_weighted_sample")} t32
       ON t32.doc_id = t1.doc_id
JOIN {_sub(textstats, "t33_script_profile")} t33
  ON t33.doc_id = t1.doc_id
JOIN {_sub(textstats, "t34_url_canonicalize")} t34
  ON t34.doc_id = t1.doc_id
JOIN {_sub(textstats, "t38_special_token_scrub")} t38
  ON t38.doc_id = t1.doc_id
JOIN {_sub(textstats, "t35_vocab_growth")} t35
  ON t35.doc_id = t1.doc_id
JOIN {_sub(textstats, "t09_repetition_profile")} t9 ON t9.doc_id = t1.doc_id
JOIN {_sub(textstats, "t10_pii_scrub")} t10 ON t10.doc_id = t1.doc_id
JOIN {_sub(fonts_q, "f02_color_semantics")} f2 ON f2.doc_id = t1.doc_id
JOIN {_sub(textstats, "t11_gopher_rules")} t11 ON t11.doc_id = t1.doc_id
JOIN {_sub(textstats, "t12_url_filter")} t12 ON t12.doc_id = t1.doc_id
JOIN {_sub(textstats, "t13_sequence_packing")} t13 ON t13.doc_id = t1.doc_id
JOIN {_sub(textstats, "t14_lm_perplexity")} t14 ON t14.doc_id = t1.doc_id
JOIN {_sub(textstats, "t15_domain_mixture")} t15 ON t15.doc_id = t1.doc_id
JOIN {_sub(textstats, "t16_bm25_score")} t16 ON t16.doc_id = t1.doc_id
JOIN (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_chunks,
             CAST(sum(n_toks) AS BIGINT) AS chunk_toks,
             md5(string_agg(chunk_md5, '' ORDER BY chunk_idx))
               AS chunk_digest
      FROM {_sub(textstats, "t17_chunk_overlap")} _t17
      GROUP BY doc_id) t17 ON t17.doc_id = t1.doc_id
JOIN {_sub(textstats, "t18_length_quantiles")} t18
  ON t18.lang = t1.labeled_lang
JOIN {_sub(textstats, "t19_split_leakage")} t19 ON t19.doc_id = t1.doc_id
JOIN {_sub(textstats, "t21_host_rank")} t21 ON t21.doc_id = t1.doc_id
JOIN {_sub(textstats, "t22_char_entropy")} t22 ON t22.doc_id = t1.doc_id
JOIN {_sub(textstats, "t24_bpe_encode")} t24 ON t24.doc_id = t1.doc_id
JOIN {_sub(textstats, "t25_readability")} t25 ON t25.doc_id = t1.doc_id
JOIN {_sub(textstats, "t26_quality_classifier")} t26
  ON t26.doc_id = t1.doc_id
JOIN {_sub(textstats, "t27_mojibake_repair")} t27 ON t27.doc_id = t1.doc_id
LEFT JOIN {_sub(textstats, "t29_shingle_novelty")} t29
  ON t29.doc_id = t1.doc_id
JOIN {_sub(textstats, "t30_dsir_weights")} t30 ON t30.doc_id = t1.doc_id
LEFT JOIN (SELECT doc_id, count(*) AS n_gaps,
                  sum(CASE WHEN is_boundary THEN 1 ELSE 0 END)
                    AS n_bounds
           FROM {_sub(textstats, "t31_texttiling")} _t31
           GROUP BY doc_id) t31 ON t31.doc_id = t1.doc_id
""",
)
def t01_suite(spark, sf):
    """Per-document text-analysis suite (one row per doc, joined on
    doc_id): language ID (t01), quality signals (t02), token counts
    (t03), rolling-hash fingerprint (t04), OCR span recovery (t07),
    font/visual evidence profile FH2-FH4 + VH3 (f01), and stratified
    quota-sample membership (t08; stratum=''/sample_rank=0 for docs
    outside the deterministic sample — coalesced, not null, so the
    hash comparator sees identical cells on both sides), A-ES
    weighted-sample membership (t32; aes_key_micro/aes_rank, 0 when
    outside the weighted sample), script-mixing/homoglyph profile
    (t33; scr_nonlatin/scr_confusable/scr_mixed/scr_keep), URL
    canonicalization + URL-keyed dedup prep (t34;
    url_canon/url_n_sharing/url_keeper), the tokenizer special-token
    scrub (t38: spec_n/spec_kinds/spec_first + the scrubbed-text md5
    and keep verdict — the control-sequence poisoning defense), the
    Heaps-law vocabulary
    growth curve (t35; vg_* cumulative columns), Gopher-style
    repetition signals (t09), PII scrub counts + masked text (t10),
    FH5/VH6 color semantics (f02: header color, exception-color
    counts, visual-vs-text header verdict), the full Gopher + C4
    quality-rule set (t11: word/line-shape rules, stopword presence,
    lorem-ipsum/brace content filters, keep verdicts), URL/domain
    blocklist filtering (t12), per-shard sequence packing into
    fixed token bins (t13), CCNet-style unigram-LM perplexity
    scoring with per-language head/middle/tail buckets (t14), and
    domain-mixture sampling to a token budget (t15: per-domain rate +
    deterministic hash-coin keep), BM25 scoring against a fixed
    query (t16: per-term tf + the score), the per-doc rollup of the
    overlapping RAG chunker (t17: chunk count, summed chunk tokens,
    and an order-pinned digest of the per-chunk content hashes — the
    chunk-grain rows themselves are the fine-grained twin), the
    per-language length-quantile profile broadcast back onto each doc
    (t18: len_p25..len_p95 + the above_median_len flag; computed via
    the scalable value-histogram method, verified against DuckDB's
    sort-based quantile_cont), the deterministic train/val/test hash
    split + cross-split exact-duplicate leakage audit (t19: split,
    n_splits, leaked), the host-graph PageRank source-quality prior
    (t21: host, host_rank_nano — exact integer nano-unit ranks), the
    character-entropy gibberish profile (t22: distinct chars,
    micro-nat entropy, keep verdict), the fixed-merge-table BPE encode
    (t24: enc_tokens/enc_distinct), Flesch-Kincaid readability (t25:
    fk_sents/fk_syll/fk_micro/readable), the trained quality classifier
    (t26: bootstrap label, learned score, keep prediction, and the
    pinned w_uniq weight — the whole 2-epoch GD trajectory rides the
    value hash), mojibake detection/repair (t27: artifact and kind
    counts + the clean flag over the deterministic cp1252 injection),
    duplicate-shingle novelty (t29: distinct/corpus-unique shingle
    counts + exact ppm ratio + boilerplate verdict; shingle-less docs
    coalesced to trivially-novel on both engines),
    DSIR importance weights (t30: hashed-bigram target/raw log-ratio
    in integer micro-nats, per-doc log importance weight + keep),
    and the TextTiling rollup (t31: gap/boundary/segment counts per
    doc; the gap grain is the fine-grained twin),
    and the composed curation funnel
    verdict (curation_keep = every filter
    stage passes;
    first_fail = the first stage that rejects, in the fixed pipeline
    order quality -> entropy -> c4 -> url -> novelty -> mixture). The
    Gopher absolute
    floors (t11) stay a reported column but sit outside the composed
    verdict: their 50-word minimum targets web pages and rejects
    every short synthetic table fragment, which would pin the funnel
    constant-false — a real deployment includes it."""
    t1 = textstats.QUERIES["t01_language_id"](spark, sf)
    t2 = textstats.QUERIES["t02_quality_score"](spark, sf)
    t3 = textstats.QUERIES["t03_token_counts"](spark, sf)
    t4 = textstats.QUERIES["t04_doc_fingerprint"](spark, sf)
    t7 = textstats.QUERIES["t07_ocr_span_recovery"](spark, sf)
    f1 = fonts_q.QUERIES["f01_font_profile"](spark, sf)
    t8 = textstats.QUERIES["t08_stratified_sample"](spark, sf)
    t32 = textstats.QUERIES["t32_weighted_sample"](spark, sf).select(
        "doc_id",
        F.col("key_micro").alias("aes_key_micro"),
        F.col("sample_rank").alias("aes_rank"),
    )
    t33 = textstats.QUERIES["t33_script_profile"](spark, sf).select(
        "doc_id",
        (F.col("n_cyr") + F.col("n_cjk") + F.col("n_greek")).alias(
            "scr_nonlatin"
        ),
        F.col("n_confusable").alias("scr_confusable"),
        F.col("mixed_script").alias("scr_mixed"),
        F.col("script_keep").alias("scr_keep"),
    )
    t34 = textstats.QUERIES["t34_url_canonicalize"](spark, sf).select(
        "doc_id",
        F.col("canon_url").alias("url_canon"),
        F.col("n_sharing").alias("url_n_sharing"),
        "url_keeper",
    )
    t38 = textstats.QUERIES["t38_special_token_scrub"](spark, sf).select(
        "doc_id",
        F.col("n_special").alias("spec_n"),
        F.col("n_kinds").alias("spec_kinds"),
        F.col("first_kind").alias("spec_first"),
        F.col("clean_hash").alias("spec_clean_hash"),
        "spec_keep",
        "spec_deep",
    )
    t35 = textstats.QUERIES["t35_vocab_growth"](spark, sf).select(
        "doc_id",
        F.col("cum_tok").alias("vg_cum_tok"),
        F.col("cum_vocab").alias("vg_cum_vocab"),
        F.col("n_new_types").alias("vg_new_types"),
        F.col("ttr_milli").alias("vg_ttr_milli"),
    )
    t9 = textstats.QUERIES["t09_repetition_profile"](spark, sf)
    t10 = textstats.QUERIES["t10_pii_scrub"](spark, sf)
    f2 = fonts_q.QUERIES["f02_color_semantics"](spark, sf)
    t11 = textstats.QUERIES["t11_gopher_rules"](spark, sf)
    t12 = textstats.QUERIES["t12_url_filter"](spark, sf)
    t13 = textstats.QUERIES["t13_sequence_packing"](spark, sf).drop("lang")
    t14 = textstats.QUERIES["t14_lm_perplexity"](spark, sf).select(
        "doc_id", "micro_lp_sum", "lm_bits_per_tok", "ppl_bucket"
    )
    t15 = textstats.QUERIES["t15_domain_mixture"](spark, sf).select(
        "doc_id", "mix_rate", "mix_keep"
    )
    t16 = textstats.QUERIES["t16_bm25_score"](spark, sf).drop("dl")
    t18 = textstats.QUERIES["t18_length_quantiles"](spark, sf).select(
        F.col("lang").alias("labeled_lang"),
        F.col("p25").alias("len_p25"),
        F.col("p50").alias("len_p50"),
        F.col("p75").alias("len_p75"),
        F.col("p95").alias("len_p95"),
    )
    t19 = textstats.QUERIES["t19_split_leakage"](spark, sf).select(
        "doc_id", "split", "n_splits", "leaked"
    )
    t21 = textstats.QUERIES["t21_host_rank"](spark, sf).select(
        "doc_id",
        "host",
        F.col("rank2_nano").alias("host_rank_nano"),
    )
    t22 = textstats.QUERIES["t22_char_entropy"](spark, sf)
    t24 = textstats.QUERIES["t24_bpe_encode"](spark, sf).select(
        "doc_id",
        F.col("n_tokens").alias("enc_tokens"),
        F.col("n_distinct_tok").alias("enc_distinct"),
    )
    t25 = textstats.QUERIES["t25_readability"](spark, sf).select(
        "doc_id",
        F.col("n_sents").alias("fk_sents"),
        F.col("n_syll").alias("fk_syll"),
        "fk_micro",
        "readable",
    )
    t26 = textstats.QUERIES["t26_quality_classifier"](spark, sf).select(
        "doc_id",
        F.col("y_label").alias("clf_label"),
        F.col("score_micro").alias("clf_score"),
        F.col("pred_keep").alias("clf_keep"),
        F.col("w_uniq").alias("clf_w_uniq"),
    )
    t27 = textstats.QUERIES["t27_mojibake_repair"](spark, sf).select(
        "doc_id",
        F.col("n_mojibake").alias("moj_n"),
        F.col("n_kinds").alias("moj_kinds"),
        F.col("clean").alias("moj_clean"),
    )
    t29 = textstats.QUERIES["t29_shingle_novelty"](spark, sf).select(
        "doc_id",
        F.col("n_shingles").alias("nov_shingles"),
        F.col("n_novel").alias("nov_novel"),
        "novelty_ppm",
        F.col("boilerplate").alias("nov_boiler"),
    )
    t30 = textstats.QUERIES["t30_dsir_weights"](spark, sf).select(
        "doc_id",
        F.col("n_bigrams").alias("dsir_bigrams"),
        F.col("log_iw_micro").alias("dsir_log_iw_micro"),
        "dsir_keep",
    )
    t31 = (
        textstats.QUERIES["t31_texttiling"](spark, sf)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("tt_gaps"),
            F.sum(F.when(F.col("is_boundary"), 1).otherwise(0))
            .cast("int")
            .alias("tt_bounds"),
        )
    )
    t17 = (
        textstats.QUERIES["t17_chunk_overlap"](spark, sf)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum("n_toks").cast("long").alias("chunk_toks"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("chunk_idx", "chunk_md5")
                            )
                        ),
                        lambda s: s.chunk_md5,
                    ),
                )
            ).alias("chunk_digest"),
        )
    )
    return (
        t1.join(t2, "doc_id")
        .join(t3, "doc_id")
        .join(t4, "doc_id")
        .join(t7, "doc_id")
        .join(f1, "doc_id")
        .join(t8, "doc_id", "left")
        .withColumn("stratum", F.coalesce("stratum", F.lit("")))
        .withColumn(
            "sample_rank",
            F.coalesce("sample_rank", F.lit(0)).cast("int"),
        )
        .join(t32, "doc_id", "left")
        .withColumn(
            "aes_key_micro",
            F.coalesce("aes_key_micro", F.lit(0)).cast("long"),
        )
        .withColumn(
            "aes_rank", F.coalesce("aes_rank", F.lit(0)).cast("int")
        )
        .join(t33, "doc_id")
        .join(t34, "doc_id")
        .join(t38, "doc_id")
        .join(t35, "doc_id")
        .join(t9, "doc_id")
        .join(t10, "doc_id")
        .join(f2, "doc_id")
        .join(t11, "doc_id")
        .join(t12, "doc_id")
        .join(t13, "doc_id")
        .join(t14, "doc_id")
        .join(t15, "doc_id")
        .join(t16, "doc_id")
        .join(t17, "doc_id")
        .join(F.broadcast(t18), "labeled_lang")
        .join(t19, "doc_id")
        .join(t21, "doc_id")
        .join(t22, "doc_id")
        .join(t24, "doc_id")
        .join(t25, "doc_id")
        .join(t26, "doc_id")
        .join(t27, "doc_id")
        .join(t29, "doc_id", "left")
        .join(t30, "doc_id")
        .join(t31, "doc_id", "left")
        .withColumn("tt_gaps", F.coalesce("tt_gaps", F.lit(0)).cast("int"))
        .withColumn(
            "tt_bounds", F.coalesce("tt_bounds", F.lit(0)).cast("int")
        )
        .withColumn(
            "tt_segments", (F.col("tt_bounds") + 1).cast("int")
        )
        .withColumn(
            "nov_shingles",
            F.coalesce("nov_shingles", F.lit(0)).cast("long"),
        )
        .withColumn(
            "nov_novel", F.coalesce("nov_novel", F.lit(0)).cast("long")
        )
        .withColumn(
            "novelty_ppm",
            F.coalesce("novelty_ppm", F.lit(1_000_000)).cast("long"),
        )
        .withColumn("nov_boiler", F.coalesce("nov_boiler", F.lit(False)))
        .withColumn("above_median_len", F.col("n_chars") > F.col("len_p50"))
        .withColumn(
            "curation_keep",
            (F.col("keep") == 1)
            & F.col("entropy_keep")
            & (F.col("c4_keep") == 1)
            & (F.col("url_keep") == 1)
            & ~F.col("nov_boiler")
            & F.col("mix_keep"),
        )
        .withColumn(
            "first_fail",
            F.when(F.col("keep") == 0, "quality")
            .when(~F.col("entropy_keep"), "entropy")
            .when(F.col("c4_keep") == 0, "c4")
            .when(F.col("url_keep") == 0, "url")
            .when(F.col("nov_boiler"), "novelty")
            .when(~F.col("mix_keep"), "mixture")
            .otherwise(""),
        )
    )


# ========================================================== multimodal
@q(
    "m01_media_suite",
    oracle=f"""
SELECT a.doc_id, a.width, a.height, a.format, a.n_bytes, b.mean_byte,
       c.new_width, c.new_height,
       e.sample_rate, e.n_samples, e.n_frames,
       g.n_sampled, g.n_shots, g.n_cuts,
       CAST(COALESCE(p.n_cand, 0) AS INTEGER) AS n_phash_cand,
       CAST(COALESCE(p.n_dup, 0) AS INTEGER) AS n_phash_dup,
       cp.n_cap, cp.n_cap_kept, cp.cap_best,
       iv.media_permille, iv.max_media_run, iv.n_alternations,
       iv.keep AS ilv_keep,
       pk.cost AS pk_cost, pk.bin AS pk_bin
FROM {_sub(multimodal_q, "m01_media_decode")} a
JOIN {_sub(multimodal_q, "m02_media_feature")} b ON b.doc_id = a.doc_id
JOIN {_sub(multimodal_q, "m04_media_resize")} c ON c.doc_id = a.doc_id
JOIN {_sub(multimodal_q, "m05_audio_segments")} e ON e.doc_id = a.doc_id
JOIN (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_sampled,
             CAST(max(shot_id) + 1 AS INTEGER) AS n_shots,
             CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END)
                  AS INTEGER) AS n_cuts
      FROM {_sub(multimodal_q, "m06_scene_segments")} _g
      GROUP BY doc_id) g ON g.doc_id = a.doc_id
LEFT JOIN (
  SELECT doc_id, count(*) AS n_cand,
         sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup
  FROM (SELECT unnest([doc_a, doc_b]) AS doc_id, is_dup
        FROM {_sub(multimodal_q, "m07_image_phash_dedup")} _p1)
  GROUP BY doc_id) p ON p.doc_id = a.doc_id
JOIN (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_cap,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS INTEGER)
               AS n_cap_kept,
             CAST(max(score_milli) AS INTEGER) AS cap_best
      FROM {_sub(multimodal_q, "m08_caption_pair")} _c8
      GROUP BY doc_id) cp ON cp.doc_id = a.doc_id
JOIN (SELECT doc_id, media_permille, max_media_run, n_alternations,
             keep
      FROM {_sub(multimodal_q, "m09_interleave_profile")} _i9) iv
  ON iv.doc_id = a.doc_id
JOIN (SELECT doc_id, cost, bin
      FROM {_sub(multimodal_q, "m10_multimodal_packing")} _pk) pk
  ON pk.doc_id = a.doc_id
""",
)
def m01_suite(spark, sf):
    """Media suite (one row per doc): mapInPandas decode metadata (m01)
    + per-blob feature extraction (m02) + aspect-preserving resize
    plan (m04) + audio segmentation framing (m05) + the per-video
    rollup of the shot/scene segmentation (m06: sampled frames, shot
    count, cut count; the frame-grain rows are the fine-grained
    twin) + the per-doc rollup of the dHash image near-dup (m07:
    candidate-pair and confirmed-dup counts; the pair grain is the
    fine-grained twin) + the per-doc rollup of the MMC4-style caption
    pairing (m08: pair/kept counts, best milli-score; the media grain
    is the fine-grained twin) + the interleave profile gate (m09) +
    the two-budget multimodal packing assignment (m10: packed cost
    and bin), joined on doc_id."""
    a = multimodal_q.QUERIES["m01_media_decode"](spark, sf)
    b = multimodal_q.QUERIES["m02_media_feature"](spark, sf).select(
        "doc_id", "mean_byte"
    )
    c = multimodal_q.QUERIES["m04_media_resize"](spark, sf).select(
        "doc_id", "new_width", "new_height"
    )
    e = multimodal_q.QUERIES["m05_audio_segments"](spark, sf).select(
        "doc_id", "sample_rate", "n_samples", "n_frames"
    )
    g = (
        multimodal_q.QUERIES["m06_scene_segments"](spark, sf)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_sampled"),
            (F.max("shot_id") + 1).cast("int").alias("n_shots"),
            F.sum(F.when(F.col("is_boundary"), 1).otherwise(0))
            .cast("int")
            .alias("n_cuts"),
        )
    )
    # explode, not a self-union: only m07's internal blocks relation is
    # persisted, so two selects from m7 would run the candidate +
    # verify joins twice
    m7 = multimodal_q.QUERIES["m07_image_phash_dedup"](spark, sf)
    p = (
        m7.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
            "is_dup",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_phash_cand"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("int")
            .alias("n_phash_dup"),
        )
    )
    cp = (
        multimodal_q.QUERIES["m08_caption_pair"](spark, sf)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_cap"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("int")
            .alias("n_cap_kept"),
            F.max("score_milli").cast("int").alias("cap_best"),
        )
    )
    iv = multimodal_q.QUERIES["m09_interleave_profile"](spark, sf).select(
        "doc_id",
        "media_permille",
        "max_media_run",
        "n_alternations",
        F.col("keep").alias("ilv_keep"),
    )
    pk = multimodal_q.QUERIES["m10_multimodal_packing"](
        spark, sf
    ).select(
        "doc_id",
        F.col("cost").alias("pk_cost"),
        F.col("bin").alias("pk_bin"),
    )
    return (
        a.join(b, "doc_id").join(c, "doc_id").join(e, "doc_id")
        .join(g, "doc_id")
        .join(p, "doc_id", "left")
        .withColumn(
            "n_phash_cand",
            F.coalesce("n_phash_cand", F.lit(0)).cast("int"),
        )
        .withColumn(
            "n_phash_dup", F.coalesce("n_phash_dup", F.lit(0)).cast("int")
        )
        .join(cp, "doc_id")
        .join(iv, "doc_id")
        .join(pk, "doc_id")
    )


# ===================================================== curation capstone
# x17: the composed end-to-end curation job (plans/curation_job.py) as
# a registered fine-grained twin — quality -> entropy -> C4 -> URL ->
# mixture -> exact-dedup keeper -> fuzzy-dedup survivor -> per-language
# token-bin packing.  The oracle composes the MEMBER oracles (each
# independently hash-green) through the identical flag algebra, so the
# whole funnel is value-hash-pinned end to end.  Driver-gate coverage
# rides the v01_validation_suite's 'x17_shard' arm (registry stays at
# 50); the standalone entry serves tests and bench.
from ..queries.base import SQL_NORM_HASH as _SQL_NH  # noqa: E402

_X17_ORACLE = f"""
WITH q2 AS {_sub(textstats, "t02_quality_score")},
q22 AS {_sub(textstats, "t22_char_entropy")},
q11 AS {_sub(textstats, "t11_gopher_rules")},
q12 AS {_sub(textstats, "t12_url_filter")},
q15 AS {_sub(textstats, "t15_domain_mixture")},
q29n AS {_sub(textstats, "t29_shingle_novelty")},
d01 AS {_sub(dedup, "d01_exact_dedup")},
d12 AS {_sub(dedup, "d12_fuzzy_dedup_funnel")},
docs AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
           AS n_tok,
         COALESCE({_SQL_NH.format(col="text")}, '') AS nh
  FROM documents
),
surv AS (
  SELECT d.doc_id, d.lang, d.n_tok
  FROM docs d
  JOIN q2 ON q2.doc_id = d.doc_id
  JOIN q22 ON q22.doc_id = d.doc_id
  JOIN q11 ON q11.doc_id = d.doc_id
  JOIN q12 ON q12.doc_id = d.doc_id
  LEFT JOIN q29n ON q29n.doc_id = d.doc_id
  JOIN q15 ON q15.doc_id = d.doc_id
  JOIN d01 ON COALESCE(d01.norm_hash, '') = d.nh
  JOIN d12 ON d12.doc_id = d.doc_id
  WHERE q2.keep = 1 AND q22.entropy_keep AND q11.c4_keep = 1
    AND q12.url_keep = 1
    AND COALESCE(NOT q29n.boilerplate, TRUE) AND q15.mix_keep
    AND d01.keeper_doc_id = d.doc_id AND d12.keep
)
SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
       CAST((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok) // 512
            AS INTEGER) AS bin
FROM surv
"""


@q("x17_curation_shards", oracle=_X17_ORACLE)
def x17(spark, sf):
    """The full curation funnel + shard packing as one query (see
    plans/curation_job.py for the job wrapper with the stage report
    and the partitioned write)."""
    from ..plans.curation_job import curation_flags, pack_survivors

    packed = pack_survivors(curation_flags(spark, sf), 512)
    return packed.select(
        "doc_id", "lang", F.col("n_tok").cast("long").alias("n_tok"), "bin"
    )


# ---------------------------------------------------------------- x20
# Shard manifest / data card (public: the Datasheets-for-Datasets /
# WebDataset-manifest practice): one row per packed shard with its
# document count, token total, a reproducibility digest (md5 over the
# ordered member ids — re-running the funnel must reproduce it
# byte-for-byte), and the shard's train/val/test mix from the t19
# hash split — the artifact a training run records so the exact data
# snapshot is auditable later.
_X20_ORACLE = f"""
WITH shard AS ({_X17_ORACLE}),
sp AS (
  SELECT doc_id, split FROM {_sub(textstats, "t19_split_leakage")} _sp
)
SELECT s.lang, s.bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(s.n_tok) AS BIGINT) AS n_tok,
       md5(string_agg(CAST(s.doc_id AS VARCHAR), ','
                      ORDER BY s.doc_id)) AS digest,
       CAST(sum(CASE WHEN sp.split = 'train' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN sp.split = 'val' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_val,
       CAST(sum(CASE WHEN sp.split = 'test' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_test
FROM shard s JOIN sp ON sp.doc_id = s.doc_id
GROUP BY s.lang, s.bin
"""


@q("x20_shard_manifest", oracle=_X20_ORACLE)
def x20(spark, sf, shards=None):
    """Per-shard manifest over the packed curation output (x17): doc
    and token counts, the ordered-member md5 digest that pins the
    exact shard composition across re-runs, and the shard's
    train/val/test mix — the data card a training job logs before
    consuming the shards.

    Scale shape: one aggregate over the already-packed shard rows
    (shard grain = thousands of rows at any corpus size, each shard a
    few hundred members); the split column broadcasts from the
    scan-local t19 assignment; the digest's collect_list is bounded
    by the shard's member cap, never corpus-sized."""
    if shards is None:
        shards = QUERIES["x17_curation_shards"](spark, sf)
    sp = textstats.QUERIES["t19_split_leakage"](spark, sf).select(
        "doc_id", "split"
    )
    j = shards.join(sp, "doc_id")
    return j.groupBy("lang", "bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tok"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("digest"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )


# ========================================================== validation
@q(
    "v01_validation_suite",
    oracle=f"""
SELECT 'v01_doc' AS fam, CAST(doc_id AS VARCHAR) AS key,
       violations_csv AS info, n_violations AS n, valid AS ok
FROM {_sub(validation_q, "v01_contract_validation")} _a
UNION ALL
SELECT 'v02_hist', violation, '', n_docs, true
FROM {_sub(validation_q, "v02_violation_histogram")} _b
UNION ALL
SELECT 'v03_gate', CAST(doc_id AS VARCHAR), missing_csv, n_missing, passed
FROM {_sub(retrieval_q, "p04_required_gate")} _c
UNION ALL
SELECT 'v04_profile', col_name,
       n_null || '#' || n_distinct || '#' || completeness_ppm || '#'
         || min_s || '#' || max_s,
       n_rows, n_null = 0
FROM {_sub(validation_q, "v04_data_profile")} _d
UNION ALL
SELECT 'v05_drift', col_name,
       n_bins || '#' || n_base || '#' || n_curr,
       psi_micro, NOT drifted
FROM {_sub(validation_q, "v05_drift_psi")} _e
UNION ALL
SELECT 'v06_fk', edge, CAST(n_rows AS VARCHAR) || '#' ||
       CAST(orphan_rate_micro AS VARCHAR), n_orphans, ok
FROM {_sub(validation_q, "v06_fk_audit")} _v6
UNION ALL
SELECT 'v07_cdc', op, changed_cols, CAST(count(*) AS BIGINT),
       count(*) > 0
FROM {_sub(validation_q, "v07_snapshot_diff")} _v7
GROUP BY op, changed_cols
UNION ALL
SELECT 'v08_apply', o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT), count(*) > 0
FROM {_sub(validation_q, "v08_cdc_apply")} _v8
GROUP BY o_orderstatus, o_orderpriority
UNION ALL
SELECT 'v09_scd2',
       CAST(ver_from AS VARCHAR) || '>' || CAST(ver_to AS VARCHAR),
       CASE WHEN is_current THEN 'open' ELSE 'closed' END,
       CAST(count(*) AS BIGINT), count(*) > 0
FROM {_sub(validation_q, "v09_scd2_history")} _v9
GROUP BY ver_from, ver_to, is_current
UNION ALL
SELECT 'v10_ivm', o_orderpriority, '', n, n > 0
FROM {_sub(validation_q, "v10_ivm_counts")} _v10
UNION ALL
SELECT 'v11_travel', o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT), count(*) > 0
FROM {_sub(validation_q, "v11_time_travel")} _v11
GROUP BY o_orderstatus, o_orderpriority
UNION ALL
SELECT 'q48_layout', CAST(bucket AS VARCHAR),
       min_x || '#' || max_x || '#' || min_y || '#' || max_y,
       n_rows,
       (min_x // 16 = max_x // 16 AND min_y // 16 = max_y // 16)
FROM {_sub(analytics_ext, "q48_zorder_layout")} _f
UNION ALL
SELECT 'v12_benford', col_name || '#' || CAST(digit AS VARCHAR),
       CAST(obs_ppm AS VARCHAR) || '#' || CAST(exp_ppm AS VARCHAR)
         || '#' || CAST(chi2_micro AS VARCHAR),
       cnt, conforms
FROM {_sub(validation_q, "v12_benford_audit")} _v12
UNION ALL
SELECT 'x18_pair', media_ref,
       caption || '#' || CAST(media_permille AS VARCHAR),
       CAST(score_milli AS BIGINT), true
FROM {_sub(multimodal_q, "x18_interleaved_pairs")} _x18
UNION ALL
SELECT 'x19_cap', media_ref, caption || '#' || caption_src,
       CAST("offset" AS BIGINT), true
FROM {_sub(extract_q, "x19_extracted_pairs")} _x19
UNION ALL
SELECT 'q51_pivot', CAST(p_partkey AS VARCHAR),
       CAST(p_size AS VARCHAR) || '#' || CAST(p_retailprice AS VARCHAR),
       n_metrics, true
FROM {_sub(analytics_ext, "q51_pivot_part_metrics")} _q51
UNION ALL
SELECT 'q52_root', CAST(node AS VARCHAR), CAST(root AS VARCHAR),
       depth, true
FROM {_sub(analytics_ext, "q52_transitive_roots")} _q52
UNION ALL
SELECT 'q53_root', CAST(node AS VARCHAR), CAST(root AS VARCHAR),
       depth, true
FROM {_sub(analytics_ext, "q53_pointer_doubling_roots")} _q53
UNION ALL
SELECT 'v13_fd', fd,
       CAST(n_groups AS VARCHAR) || '#' || CAST(max_rhs AS VARCHAR),
       viol_ppm, holds
FROM {_sub(validation_q, "v13_fd_audit")} _v13
UNION ALL
SELECT 'v14_mad', CAST(o_orderkey AS VARCHAR),
       o_orderpriority || '#' || CAST(cents AS VARCHAR),
       z_milli, NOT outlier
FROM {_sub(validation_q, "v14_mad_outliers")} _v14
UNION ALL
SELECT 'q56_tri', CAST(doc_id AS VARCHAR),
       CAST(degree AS VARCHAR) || '#' || CAST(n_triangles AS VARCHAR),
       clustering_ppm, true
FROM {_sub(analytics_ext, "q56_triangle_census")} _q56
UNION ALL
SELECT 'v15_hist',
       col_name || '#' || kind || '#' || CAST(bucket AS VARCHAR),
       CAST(lo AS VARCHAR) || '#' || CAST(hi AS VARCHAR),
       n_rows, true
FROM {_sub(validation_q, "v15_column_histograms")} _v15
UNION ALL
SELECT 'v16_suggest', col_name || '#' || kind,
       CAST(suggested AS VARCHAR) || '#' || param || '#' || verdict,
       n_violations, verdict <> 'fail'
FROM {_sub(validation_q, "v16_constraint_suggestion")} _v16
UNION ALL
SELECT 'x20_manifest', lang || '#' || CAST(bin AS VARCHAR),
       digest || '#' || CAST(n_train AS VARCHAR) || '#'
         || CAST(n_val AS VARCHAR) || '#' || CAST(n_test AS VARCHAR),
       n_tok, n_docs > 0
FROM ({_X20_ORACLE}) _x20
UNION ALL
SELECT 'x17_shard', CAST(doc_id AS VARCHAR),
       lang || '#' || bin, n_tok, true
FROM (
{_X17_ORACLE}
) _g
""",
)
def v01_suite(spark, sf):
    """Contract-validation suite: per-doc assert columns condensed to the
    violations CSV (v01 — the CSV encodes exactly the failed assert
    columns) + the corpus-level violation histogram (v02) + the
    metadata required-field gate over the composed quick_scan chain
    (p04, docpact retrieval.py:340-366) + the Deequ-style column
    profiler (v04: key = column, info = null/distinct/completeness/
    min/max, ok = null-free) + PSI snapshot-drift detection (v05:
    key = monitored dim, info = bins/base/current sizes, n = micro
    PSI, ok = below the 0.2 drift threshold) + the referential-
    integrity audit (v06: key = FK edge, info = rows#orphan-rate,
    n = orphans, ok = intact; one deterministically-damaged edge keeps
    the orphan branch live) + the CDC snapshot diff condensed to
    (op, changed-column-set) counts (v07: key = I/D/U, info = the
    changed-cols CSV, n = changelog rows in that class; the per-key
    changelog itself is the fine-grained twin) + the CDC merge-apply
    round trip condensed to (status, priority) class counts (v08: the
    fine-grained twin hash-pins apply(old, diff(old, new)) == new
    row-for-row against the NEW snapshot itself) + the SCD Type-2
    history condensed to version-span classes (v09: key =
    ver_from>ver_to, info = open/closed; the per-key history is the
    fine-grained twin) + the incrementally-maintained count view
    (v10: key = group, n = old aggregate merged with exact changelog
    deltas; its oracle recomputes on the NEW snapshot, pinning the
    delta algebra) + the AS OF time travel over the SCD2 history
    condensed to (status, priority) class counts (v11: the
    fine-grained twin reconstructs the OLD snapshot row-for-row) +
    the z-order layout
    audit (q48: key = layout bucket, info = covered rectangle, ok =
    the 16x16 tile-containment pruning guarantee) + the composed
    curation capstone's packed shards (x17: key = surviving doc,
    info = lang#bin, n = tokens) + the Benford digit audit (v12) +
    interleaved/extracted caption pairs (x18/x19) + the pivot (q51)
    and both transitive-closure formulations (q52 walk / q53 pointer
    doubling) + the functional-dependency audit (v13: key = the
    candidate A->B, info = groups#worst, n = ppm violations, ok =
    holds) + the shard manifest / data card (x20: key = lang#bin,
    info = member digest + split mix, n = shard tokens) + the
    Deequ-style constraint suggestion/verification (v16: key =
    column#kind, info = suggested#param#verdict, n = batch
    violations, ok = the constraint did not fail on the corrupted
    batch; the declined candidate reads -1/'not_checked')."""
    a = validation_q.QUERIES["v01_contract_validation"](spark, sf).select(
        F.lit("v01_doc").alias("fam"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("violations_csv").alias("info"),
        F.col("n_violations").alias("n"),
        F.col("valid").alias("ok"),
    )
    b = validation_q.QUERIES["v02_violation_histogram"](spark, sf).select(
        F.lit("v02_hist").alias("fam"),
        F.col("violation").alias("key"),
        F.lit("").alias("info"),
        F.col("n_docs").alias("n"),
        F.lit(True).alias("ok"),
    )
    c = retrieval_q.QUERIES["p04_required_gate"](spark, sf).select(
        F.lit("v03_gate").alias("fam"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("missing_csv").alias("info"),
        F.col("n_missing").alias("n"),
        F.col("passed").alias("ok"),
    )
    d = validation_q.QUERIES["v04_data_profile"](spark, sf).select(
        F.lit("v04_profile").alias("fam"),
        F.col("col_name").alias("key"),
        F.concat_ws(
            "#", "n_null", "n_distinct", "completeness_ppm", "min_s",
            "max_s",
        ).alias("info"),
        F.col("n_rows").alias("n"),
        (F.col("n_null") == 0).alias("ok"),
    )
    e = validation_q.QUERIES["v05_drift_psi"](spark, sf).select(
        F.lit("v05_drift").alias("fam"),
        F.col("col_name").alias("key"),
        F.concat_ws("#", "n_bins", "n_base", "n_curr").alias("info"),
        F.col("psi_micro").alias("n"),
        (~F.col("drifted")).alias("ok"),
    )
    v6 = validation_q.QUERIES["v06_fk_audit"](spark, sf).select(
        F.lit("v06_fk").alias("fam"),
        F.col("edge").alias("key"),
        F.concat_ws(
            "#",
            F.col("n_rows").cast("string"),
            F.col("orphan_rate_micro").cast("string"),
        ).alias("info"),
        F.col("n_orphans").alias("n"),
        F.col("ok"),
    )
    v7 = (
        validation_q.QUERIES["v07_snapshot_diff"](spark, sf)
        .groupBy("op", "changed_cols")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("v07_cdc").alias("fam"),
            F.col("op").alias("key"),
            F.col("changed_cols").alias("info"),
            "n",
            (F.col("n") > 0).alias("ok"),
        )
    )
    v8 = (
        validation_q.QUERIES["v08_cdc_apply"](spark, sf)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("v08_apply").alias("fam"),
            F.col("o_orderstatus").alias("key"),
            F.col("o_orderpriority").alias("info"),
            "n",
            (F.col("n") > 0).alias("ok"),
        )
    )
    v9 = (
        validation_q.QUERIES["v09_scd2_history"](spark, sf)
        .groupBy("ver_from", "ver_to", "is_current")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("v09_scd2").alias("fam"),
            F.concat_ws(
                ">",
                F.col("ver_from").cast("string"),
                F.col("ver_to").cast("string"),
            ).alias("key"),
            F.when(F.col("is_current"), "open")
            .otherwise("closed")
            .alias("info"),
            "n",
            (F.col("n") > 0).alias("ok"),
        )
    )
    v10 = validation_q.QUERIES["v10_ivm_counts"](spark, sf).select(
        F.lit("v10_ivm").alias("fam"),
        F.col("o_orderpriority").alias("key"),
        F.lit("").alias("info"),
        "n",
        (F.col("n") > 0).alias("ok"),
    )
    v11 = (
        validation_q.QUERIES["v11_time_travel"](spark, sf)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("v11_travel").alias("fam"),
            F.col("o_orderstatus").alias("key"),
            F.col("o_orderpriority").alias("info"),
            "n",
            (F.col("n") > 0).alias("ok"),
        )
    )
    f = analytics_ext.QUERIES["q48_zorder_layout"](spark, sf).select(
        F.lit("q48_layout").alias("fam"),
        F.col("bucket").cast("string").alias("key"),
        F.concat_ws("#", "min_x", "max_x", "min_y", "max_y").alias(
            "info"
        ),
        F.col("n_rows").alias("n"),
        (
            (F.expr("min_x div 16") == F.expr("max_x div 16"))
            & (F.expr("min_y div 16") == F.expr("max_y div 16"))
        ).alias("ok"),
    )
    shards_df = QUERIES["x17_curation_shards"](spark, sf).persist()
    g = shards_df.select(
        F.lit("x17_shard").alias("fam"),
        F.col("doc_id").cast("string").alias("key"),
        F.concat_ws("#", "lang", "bin").alias("info"),
        F.col("n_tok").alias("n"),
        F.lit(True).alias("ok"),
    )
    v12 = validation_q.QUERIES["v12_benford_audit"](spark, sf).select(
        F.lit("v12_benford").alias("fam"),
        F.concat_ws(
            "#", "col_name", F.col("digit").cast("string")
        ).alias("key"),
        F.concat_ws(
            "#",
            F.col("obs_ppm").cast("string"),
            F.col("exp_ppm").cast("string"),
            F.col("chi2_micro").cast("string"),
        ).alias("info"),
        F.col("cnt").alias("n"),
        F.col("conforms").alias("ok"),
    )
    x18 = multimodal_q.QUERIES["x18_interleaved_pairs"](spark, sf).select(
        F.lit("x18_pair").alias("fam"),
        F.col("media_ref").alias("key"),
        F.concat_ws(
            "#", "caption", F.col("media_permille").cast("string")
        ).alias("info"),
        F.col("score_milli").cast("long").alias("n"),
        F.lit(True).alias("ok"),
    )
    x19 = extract_q.QUERIES["x19_extracted_pairs"](spark, sf).select(
        F.lit("x19_cap").alias("fam"),
        F.col("media_ref").alias("key"),
        F.concat_ws("#", "caption", "caption_src").alias("info"),
        F.col("offset").cast("long").alias("n"),
        F.lit(True).alias("ok"),
    )
    q51 = analytics_ext.QUERIES["q51_pivot_part_metrics"](
        spark, sf
    ).select(
        F.lit("q51_pivot").alias("fam"),
        F.col("p_partkey").cast("string").alias("key"),
        F.concat_ws(
            "#",
            F.col("p_size").cast("string"),
            F.col("p_retailprice").cast("string"),
        ).alias("info"),
        F.col("n_metrics").cast("long").alias("n"),
        F.lit(True).alias("ok"),
    )
    q52 = analytics_ext.QUERIES["q52_transitive_roots"](
        spark, sf
    ).select(
        F.lit("q52_root").alias("fam"),
        F.col("node").cast("string").alias("key"),
        F.col("root").cast("string").alias("info"),
        F.col("depth").cast("long").alias("n"),
        F.lit(True).alias("ok"),
    )
    q53 = analytics_ext.QUERIES["q53_pointer_doubling_roots"](
        spark, sf
    ).select(
        F.lit("q53_root").alias("fam"),
        F.col("node").cast("string").alias("key"),
        F.col("root").cast("string").alias("info"),
        F.col("depth").cast("long").alias("n"),
        F.lit(True).alias("ok"),
    )
    v13 = validation_q.QUERIES["v13_fd_audit"](spark, sf).select(
        F.lit("v13_fd").alias("fam"),
        F.col("fd").alias("key"),
        F.concat_ws(
            "#",
            F.col("n_groups").cast("string"),
            F.col("max_rhs").cast("string"),
        ).alias("info"),
        F.col("viol_ppm").alias("n"),
        F.col("holds").alias("ok"),
    )
    v14 = validation_q.QUERIES["v14_mad_outliers"](spark, sf).select(
        F.lit("v14_mad").alias("fam"),
        F.col("o_orderkey").cast("string").alias("key"),
        F.concat_ws(
            "#", "o_orderpriority", F.col("cents").cast("string")
        ).alias("info"),
        F.col("z_milli").alias("n"),
        (~F.col("outlier")).alias("ok"),
    )
    q56 = analytics_ext.QUERIES["q56_triangle_census"](spark, sf).select(
        F.lit("q56_tri").alias("fam"),
        F.col("doc_id").cast("string").alias("key"),
        F.concat_ws(
            "#",
            F.col("degree").cast("string"),
            F.col("n_triangles").cast("string"),
        ).alias("info"),
        F.col("clustering_ppm").alias("n"),
        F.lit(True).alias("ok"),
    )
    v15 = validation_q.QUERIES["v15_column_histograms"](
        spark, sf
    ).select(
        F.lit("v15_hist").alias("fam"),
        F.concat_ws(
            "#", "col_name", "kind", F.col("bucket").cast("string")
        ).alias("key"),
        F.concat_ws(
            "#", F.col("lo").cast("string"), F.col("hi").cast("string")
        ).alias("info"),
        F.col("n_rows").alias("n"),
        F.lit(True).alias("ok"),
    )
    x20 = QUERIES["x20_shard_manifest"](spark, sf, shards_df).select(
        F.lit("x20_manifest").alias("fam"),
        F.concat_ws("#", "lang", F.col("bin").cast("string")).alias(
            "key"
        ),
        F.concat_ws(
            "#",
            "digest",
            F.col("n_train").cast("string"),
            F.col("n_val").cast("string"),
            F.col("n_test").cast("string"),
        ).alias("info"),
        F.col("n_tok").alias("n"),
        (F.col("n_docs") > 0).alias("ok"),
    )
    v16 = validation_q.QUERIES["v16_constraint_suggestion"](
        spark, sf
    ).select(
        F.lit("v16_suggest").alias("fam"),
        F.concat_ws("#", "col_name", "kind").alias("key"),
        F.concat_ws(
            "#", F.col("suggested").cast("string"), "param", "verdict"
        ).alias("info"),
        F.col("n_violations").alias("n"),
        (F.col("verdict") != "fail").alias("ok"),
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d)
        .unionByName(e).unionByName(v6).unionByName(v7)
        .unionByName(v8).unionByName(v9).unionByName(v10)
        .unionByName(v11).unionByName(f).unionByName(g)
        .unionByName(v12).unionByName(x18).unionByName(x19)
        .unionByName(q51).unionByName(q52).unionByName(q53)
        .unionByName(v13).unionByName(v14).unionByName(x20)
        .unionByName(q56).unionByName(v15).unionByName(v16)
    )


@q(
    "r01_report_date_suite",
    oracle=f"""
SELECT 'filename' AS source, o_orderkey AS line_id, report_date, resolved
FROM {_sub(validation_q, "r01_report_date_filename")} _a
UNION ALL
SELECT 'content', o_orderkey, report_date, resolved
FROM {_sub(validation_q, "r02_report_date_content")} _b
""",
)
def r01_suite(spark, sf):
    """Report-date resolution suite (docpact report_date.py:29-81):
    "filename" source (regex date tokens + multi-format coalesce) and
    "content" source (RH1 temporal phrase over the title zone)."""
    a = validation_q.QUERIES["r01_report_date_filename"](spark, sf).select(
        F.lit("filename").alias("source"),
        F.col("o_orderkey").alias("line_id"),
        "report_date",
        "resolved",
    )
    b = validation_q.QUERIES["r02_report_date_content"](spark, sf).select(
        F.lit("content").alias("source"),
        F.col("o_orderkey").alias("line_id"),
        "report_date",
        "resolved",
    )
    return a.unionByName(b)


# ========================================================== schema map
@q(
    "h01_schema_map_suite",
    oracle=f"""
SELECT 'h01_map' AS fam, header, coalesce(canonical, '') AS canonical,
       coalesce(match_via, '') AS match_via, 0 AS n
FROM {_sub(schema_map_q, "h01_header_schema_map")} _a
UNION ALL
SELECT 'h02_coverage', '', canonical, CASE WHEN covered THEN 'covered'
       ELSE 'uncovered' END, n_headers
FROM {_sub(schema_map_q, "h02_preflight_coverage")} _b
UNION ALL
SELECT 'h03_title', title, coalesce(canonical, ''),
       coalesce(match_via, ''), 0
FROM {_sub(schema_map_q, "h03_title_constant_dim")} _c
UNION ALL
SELECT 'h04_fuzzy', header, canonical,
       CASE WHEN accepted THEN 'trigram' ELSE 'rejected' END, jac_milli
FROM {_sub(schema_map_q, "h04_fuzzy_schema_match")} _d
""",
)
def h01_suite(spark, sf):
    """Schema-mapping suite: 3-pass broadcast alias resolution with
    year-template aliases resolved driver-side (h01) + the preflight
    header-coverage report (h02) + title -> constant-dimension matching
    (h03, exact-then-unique-substring against dimension-type aliases) +
    trigram-Jaccard fuzzy matching over the exact passes' residue
    (h04: integer milli scores, accept/reject verdicts)."""
    a = schema_map_q.QUERIES["h01_header_schema_map"](spark, sf).select(
        F.lit("h01_map").alias("fam"),
        "header",
        F.coalesce("canonical", F.lit("")).alias("canonical"),
        F.coalesce("match_via", F.lit("")).alias("match_via"),
        F.lit(0).cast("long").alias("n"),
    )
    b = schema_map_q.QUERIES["h02_preflight_coverage"](spark, sf).select(
        F.lit("h02_coverage").alias("fam"),
        F.lit("").alias("header"),
        "canonical",
        F.when(F.col("covered"), "covered")
        .otherwise("uncovered")
        .alias("match_via"),
        F.col("n_headers").alias("n"),
    )
    c = schema_map_q.QUERIES["h03_title_constant_dim"](spark, sf).select(
        F.lit("h03_title").alias("fam"),
        F.col("title").alias("header"),
        F.coalesce("canonical", F.lit("")).alias("canonical"),
        F.coalesce("match_via", F.lit("")).alias("match_via"),
        F.lit(0).cast("long").alias("n"),
    )
    d = schema_map_q.QUERIES["h04_fuzzy_schema_match"](spark, sf).select(
        F.lit("h04_fuzzy").alias("fam"),
        "header",
        "canonical",
        F.when(F.col("accepted"), "trigram")
        .otherwise("rejected")
        .alias("match_via"),
        F.col("jac_milli").cast("long").alias("n"),
    )
    return a.unionByName(b).unionByName(c).unionByName(d)


# ================================================== metadata retrieval
@q(
    "p01_metadata_suite",
    oracle=f"""
SELECT 'p01' AS fam, CAST(line_id AS VARCHAR) AS key, pattern AS name,
       captured AS value, '' AS zone, 0.0 AS conf
FROM {_sub(functions_q, "p01_metadata_patterns")} _a
UNION ALL
SELECT 'p03', CAST(doc_id AS VARCHAR), field, value,
       source_zone, CAST(confidence AS DOUBLE)
FROM {_sub(retrieval_q, "p03_quick_scan")} _b
""",
)
def p01_metadata_suite(spark, sf):
    """Metadata retrieval suite: the RH1/RH4/RH5 pattern families over
    the deterministic line stream (p01) + the COMPOSED per-field
    quick_scan operator (p03: ordered zones -> custom-then-category
    patterns -> first match -> fallback chain, docpact
    retrieval.py:229-334 + 393-430). Schema: (fam, key, name, value,
    zone, conf)."""
    a = functions_q.QUERIES["p01_metadata_patterns"](spark, sf).select(
        F.lit("p01").alias("fam"),
        F.col("line_id").cast("string").alias("key"),
        F.col("pattern").alias("name"),
        F.col("captured").alias("value"),
        F.lit("").alias("zone"),
        F.lit(0.0).alias("conf"),
    )
    b = retrieval_q.QUERIES["p03_quick_scan"](spark, sf).select(
        F.lit("p03").alias("fam"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("field").alias("name"),
        F.col("value"),
        F.col("source_zone").alias("zone"),
        F.col("confidence").cast("double").alias("conf"),
    )
    return a.unionByName(b)


# ============================================================= unpivot
@q(
    "u01_unpivot_suite",
    oracle=f"""
SELECT 'u01' AS fam, CAST(o_custkey AS VARCHAR) AS k, _pivot AS pivot,
       n_orders AS n, total, '' AS rec
FROM {_sub(schema_map_q, "u01_unpivot_compound_headers")} _a
UNION ALL
SELECT 'u02', doc_id, group_key, row_id, 0.0,
       region || '|' || crop || '|' || unit || '|' || source || '|' ||
       year || '|' || area || '|' || value
FROM {_sub(schema_map_q, "u02_deterministic_mapping")} _b
""",
)
def u01_suite(spark, sf):
    """Unpivot/reshaping suite: schema-agnostic compound-header unpivot
    via one stack() projection (u01, docpact unpivot.py:143-400) + the
    full deterministic dimension/measure mapping (u02,
    interpret.py:1335-1618 — group/constant dimensions, int+float
    shared-alias rule, one record per row x group). u02's all-string
    record fields ride a single concat column; u01's measures stay in
    typed numeric columns for the comparator's float normalization."""
    a = schema_map_q.QUERIES["u01_unpivot_compound_headers"](spark, sf).select(
        F.lit("u01").alias("fam"),
        F.col("o_custkey").cast("string").alias("k"),
        F.col("_pivot").alias("pivot"),
        F.col("n_orders").cast("long").alias("n"),
        "total",
        F.lit("").alias("rec"),
    )
    b = schema_map_q.QUERIES["u02_deterministic_mapping"](spark, sf).select(
        F.lit("u02").alias("fam"),
        F.col("doc_id").alias("k"),
        F.col("group_key").alias("pivot"),
        F.col("row_id").cast("long").alias("n"),
        F.lit(0.0).alias("total"),
        F.concat_ws(
            "|", "region", "crop", "unit", "source", "year", "area", "value"
        ).alias("rec"),
    )
    return a.unionByName(b)


# ============================================================ classify
@q(
    "c01_classify_suite",
    oracle=f"""
WITH c1 AS {_sub(classify_q, "c01_keyword_classify")},
c2 AS {_sub(classify_q, "c02_classify_propagate")},
c3 AS {_sub(classify_q, "c03_min_rows_gate")}
SELECT c1.doc_id, c1.category, c1.score,
       coalesce(c2.category, '') AS adopted_category,
       coalesce(c2.sim, -1.0) AS adopted_sim,
       c3.n_rows, c3.category AS gated_category, c3.gated
FROM c1 LEFT JOIN c2 ON c2.doc_id = c1.doc_id
JOIN c3 ON c3.doc_id = c1.doc_id
""",
)
def c01_suite(spark, sf):
    """Classification suite: keyword classification (c01, broadcast
    inverted-index equi-join + argmax) left-joined with similarity
    propagation over the unmatched docs (c02); docs that classified
    directly carry the ('', -1.0) sentinel in the propagation columns.
    The min_data_rows gate (c03) contributes the token-count row
    analogue and the post-gate category."""
    c1 = classify_q.QUERIES["c01_keyword_classify"](spark, sf)
    c2 = classify_q.QUERIES["c02_classify_propagate"](spark, sf).select(
        "doc_id",
        F.col("category").alias("adopted_category"),
        F.col("sim").alias("adopted_sim"),
    )
    c3 = classify_q.QUERIES["c03_min_rows_gate"](spark, sf).select(
        "doc_id",
        "n_rows",
        F.col("category").alias("gated_category"),
        "gated",
    )
    return (
        c1.join(c2, "doc_id", "left")
        .join(c3, "doc_id")
        .select(
            "doc_id",
            "category",
            "score",
            F.coalesce("adopted_category", F.lit("")).alias("adopted_category"),
            F.coalesce("adopted_sim", F.lit(-1.0)).alias("adopted_sim"),
            "n_rows",
            "gated_category",
            "gated",
        )
    )


# ====================================================== twin equality
@q(
    "x07_twin_extract_suite",
    oracle="""
SELECT f.family, g.pair_id, true AS equal
FROM (VALUES ('transposed'), ('multirow'), ('width'), ('gridheader'),
             ('stacked'), ('flowheader'), ('reheader'), ('gridformat'))
     f(family),
     (SELECT unnest(generate_series(0, 23)) AS pair_id) g
""",
)
def x07_suite(spark, sf):
    """Twin-equality extraction suite — each family runs a twin-pair
    corpus through the FULL Spark pipeline and pins per-pair span-
    sequence equality (equal=true constants as the oracle):
    'transposed' (x07: transposed table vs flat twin, docpact
    compress.py:1762-1803 + interpret.py:1738-1816), 'multirow' (x08:
    period-2 records vs pre-merged twin, compress.py:1390-1466),
    'width' (x10: PDF-merged spans + width channel vs unmerged twin,
    compress.py:948-1032 + spatial_text.py:297-308), 'gridheader'
    (x11: multi-row grid header vs flat compound-name twin,
    xlsx_extractor.py:377-430 + 434-476), 'stacked' (x12:
    preceding+in-run stacked PDF header vs flat compound-name twin,
    compress.py:2534-2552 + _build_stacked_headers 1549-1644),
    'flowheader' (x13: DOCX-flow merged hierarchical header + DH4
    boundary-aware fill vs flat compound-name twin,
    docx_extractor.py:344-450), 'reheader' (x14: permuted section
    re-header remapped to global column order,
    interpret.py:1185-1240)."""
    fams = (
        ("transposed", "x07_transposed_extract"),
        ("multirow", "x08_multirow_extract"),
        ("width", "x10_width_split_extract"),
        ("gridheader", "x11_grid_header_extract"),
        ("stacked", "x12_stacked_header_extract"),
        ("flowheader", "x13_flow_header_extract"),
        ("reheader", "x14_reheader_extract"),
        ("gridformat", "x15_grid_format_extract"),
    )
    parts = [
        extract_q.QUERIES[name](spark, sf).select(
            F.lit(fam).alias("family"), "pair_id", "equal"
        )
        for fam, name in fams
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# =================================================== extraction report
_N_TRUTH = 16  # docs per family (fixed, sf-independent — the x09 pattern)


def _truth_docs():
    """[(doc_id, input spans, expected (kind,text,media_ref) seq,
    expected dropped)] for the three generator-ground-truth families."""
    from ..corpus import boxes_truth_doc, html_truth_doc, mixed_truth_doc

    out = []
    for fam, gen in (
        ("mixed", mixed_truth_doc),
        ("html", html_truth_doc),
        ("boxes", boxes_truth_doc),
    ):
        for i in range(_N_TRUTH):
            spans, exp, dropped = gen(i)
            out.append((f"{fam}-tr{i:06d}", spans, exp, dropped))
    return out


def x02_extract_report_suite(spark, sf):
    """Generator-ground-truth extraction suite: the full pipeline runs
    over the html / boxes / mixed truth families (corpus.py
    *_truth_doc — each document built TOGETHER with its exact expected
    output span sequence, no kernel consulted) and emits one row per
    output span plus per-doc metric rows. The oracle embeds the
    expectations as SQL constants, so boilerplate stripping, grid
    expansion, box clustering/table gating, coercion, enum validation
    and ordering are all value-hash-pinned. The kernel-derived corpus
    REPORT members (x02 metrics / x04 drop histogram / x06 compression
    ratios) stay fine-grained FULL queries — they summarize kernel
    output, so no independent truth exists for them by definition.

    Schema: (fam, doc_id, kind, text, media_ref, n)."""
    from ..extract.pipeline import extract
    from ..extract.schema import INPUT_SCHEMA, span_dicts

    rows = [
        {"doc_id": doc_id, "spans": span_dicts(spans)}
        for doc_id, spans, _exp, _dropped in _truth_docs()
    ]
    inp = spark.createDataFrame(rows, INPUT_SCHEMA)
    out = extract(inp)
    fam = F.split("doc_id", "-")[0].alias("fam")
    span_rows = out.select(
        fam,
        "doc_id",
        F.explode("spans").alias("s"),
    ).select(
        "fam",
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").cast("long").alias("n"),
    )
    metric_rows = out.select(
        fam,
        "doc_id",
        F.explode(
            F.create_map(
                F.lit("_spans_in"), F.col("metrics.spans_in").cast("long"),
                F.lit("_dropped"), F.col("metrics.dropped").cast("long"),
            )
        ).alias("kind", "n"),
    ).select(
        "fam", "doc_id", "kind",
        F.lit("").alias("text"), F.lit("").alias("media_ref"), "n",
    )
    return span_rows.unionByName(metric_rows)


def _x02_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = []
    for doc_id, spans, exp, dropped in _truth_docs():
        fam = doc_id.split("-")[0]
        for off, (kind, text, ref) in enumerate(exp):
            vals.append(
                f"({q(fam)}, {q(doc_id)}, {q(kind)}, {q(text)},"
                f" {q(ref)}, {off})"
            )
        vals.append(f"({q(fam)}, {q(doc_id)}, '_spans_in', '', '', {len(spans)})")
        vals.append(f"({q(fam)}, {q(doc_id)}, '_dropped', '', '', {dropped})")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(fam, doc_id, kind, text, media_ref, n)"
    )


QUERIES["x02_extract_report_suite"] = x02_extract_report_suite
ORACLE["x02_extract_report_suite"] = _x02_oracle()


# ===================================================== term mining
@q(
    "t06_term_mining_suite",
    oracle=f"""
SELECT 'tfidf' AS fam, doc_id AS id, term, tfidf AS score,
       CAST(rk AS INTEGER) AS rk, FALSE AS flag
FROM {_sub(textstats, "t06_tfidf_top_terms")} _a
UNION ALL
SELECT 'bpe', CAST(it AS BIGINT), a || '|' || b, CAST(cnt AS DOUBLE),
       0, is_merge
FROM {_sub(textstats, "t20_bpe_merges")} _b
UNION ALL
SELECT 'index', df, term || '#' || postings_digest, CAST(cf AS DOUBLE),
       CAST(idf_micro AS INTEGER), df = 1
FROM {_sub(textstats, "t23_inverted_index")} _c
UNION ALL
SELECT 'pmi', c_xy, w1 || ' ' || w2, CAST(pmi_milli AS DOUBLE),
       CAST(least(c_x, c_y) AS INTEGER), is_collocation
FROM {_sub(textstats, "t28_pmi_collocations")} _d
UNION ALL
SELECT 'lang_cm', n, labeled_lang || '>' || pred_lang,
       CAST(cell_ppm AS DOUBLE), CAST(precision_ppm AS INTEGER),
       is_diag
FROM {_sub(textstats, "t36_langid_confusion")} _e
UNION ALL
SELECT 'rake', doc_id, phrase, CAST(score_milli AS DOUBLE),
       CAST(rank AS INTEGER), rank = 1
FROM {_sub(textstats, "t37_rake_keyphrases")} _f
""",
)
def t06_term_mining_suite(spark, sf):
    """Term-grain text-mining suite (tagged union): TF-IDF top-3 terms
    per document (t06), two unrolled BPE tokenizer-training merge
    iterations (t20: id = iteration, term = 'a|b' symbol pair, score =
    corpus pair count, flag = the pair merged that iteration), and the
    inverted-index build (t23: id = document frequency, term carries
    the order-pinned posting digest, score = collection frequency,
    rk = integer micro-nat IDF, flag = hapax), and PMI collocation
    mining (t28: id = bigram count, term = 'w1 w2', score = the exact
    milli-unit association ratio — monotone in PMI, integer on both
    engines — rk = the rarer word's count, flag = collocation
    verdict)."""
    a = textstats.QUERIES["t06_tfidf_top_terms"](spark, sf).select(
        F.lit("tfidf").alias("fam"),
        F.col("doc_id").alias("id"),
        "term",
        F.col("tfidf").alias("score"),
        F.col("rk").cast("int").alias("rk"),
        F.lit(False).alias("flag"),
    )
    b = textstats.QUERIES["t20_bpe_merges"](spark, sf).select(
        F.lit("bpe").alias("fam"),
        F.col("it").cast("long").alias("id"),
        F.concat_ws("|", "a", "b").alias("term"),
        F.col("cnt").cast("double").alias("score"),
        F.lit(0).cast("int").alias("rk"),
        F.col("is_merge").alias("flag"),
    )
    c = textstats.QUERIES["t23_inverted_index"](spark, sf).select(
        F.lit("index").alias("fam"),
        F.col("df").alias("id"),
        F.concat_ws("#", "term", "postings_digest").alias("term"),
        F.col("cf").cast("double").alias("score"),
        F.col("idf_micro").cast("int").alias("rk"),
        (F.col("df") == 1).alias("flag"),
    )
    d = textstats.QUERIES["t28_pmi_collocations"](spark, sf).select(
        F.lit("pmi").alias("fam"),
        F.col("c_xy").alias("id"),
        F.concat_ws(" ", "w1", "w2").alias("term"),
        F.col("pmi_milli").cast("double").alias("score"),
        F.least("c_x", "c_y").cast("int").alias("rk"),
        F.col("is_collocation").alias("flag"),
    )
    e = textstats.QUERIES["t36_langid_confusion"](spark, sf).select(
        F.lit("lang_cm").alias("fam"),
        F.col("n").alias("id"),
        F.concat_ws(">", "labeled_lang", "pred_lang").alias("term"),
        F.col("cell_ppm").cast("double").alias("score"),
        F.col("precision_ppm").cast("int").alias("rk"),
        F.col("is_diag").alias("flag"),
    )
    f = textstats.QUERIES["t37_rake_keyphrases"](spark, sf).select(
        F.lit("rake").alias("fam"),
        F.col("doc_id").alias("id"),
        F.col("phrase").alias("term"),
        F.col("score_milli").cast("double").alias("score"),
        F.col("rank").cast("int").alias("rk"),
        (F.col("rank") == 1).alias("flag"),
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d)
        .unionByName(e).unionByName(f)
    )


# ====================================================== q25 suite
# q25 exact distinct-cardinality stats + q26 HLL validation — both
# one row per l_returnflag over lineitem, wide-joined (round-5
# registry merge: frees the driver slot x21_incremental_refresh
# takes; the members stay individually registered/benched).
@q(
    "q25_distinct_suite",
    oracle=f"""
SELECT a.l_returnflag, a.n_parts, a.n_supps, a.n_rows,
       b.exact_parts, b.hll_within_10pct
FROM {_sub(setops_arrays, "q25_distinct_counts")} a
JOIN {_sub(setops_arrays, "q26_approx_distinct")} b
  ON b.l_returnflag = a.l_returnflag
""",
)
def q25_suite(spark, sf):
    """q25 exact distinct counts + q26 approx-distinct validation,
    wide-joined on l_returnflag (3 rows)."""
    a = setops_arrays.QUERIES["q25_distinct_counts"](spark, sf)
    b = setops_arrays.QUERIES["q26_approx_distinct"](spark, sf)
    return a.join(b, "l_returnflag")
