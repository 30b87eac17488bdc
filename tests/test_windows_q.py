"""Literal-frame edge cases for the temporal operators — q41's atomic
(ts, value) pairing on NULL-value purchases (the shipped corpus has
none) and q44's strict stage ordering on out-of-order arrivals — plus
the q48 z-order locality contract (analytics_ext)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from pdf_ocr_spark.queries.windows import asof_last_purchase, event_funnel

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(m):
    return dt.datetime(2024, 1, 1, 12, m)


def test_asof_null_value_purchase_pairs_atomically(spark):
    # purchase A (value 5.0) then purchase B (value NULL); a later view
    # event must get (B.ts, -1.0) — never the phantom pair (B.ts, 5.0)
    rows = [
        (1, _t(0), 7, "purchase", 5.0),
        (2, _t(10), 7, "purchase", None),
        (3, _t(20), 7, "view", None),
        (4, _t(5), 7, "view", None),  # between A and B -> (A.ts, 5.0)
        (5, _t(1), 8, "view", None),  # other user, no purchase -> sentinel
    ]
    out = {
        r["event_id"]: r
        for r in asof_last_purchase(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert out[3]["last_purchase_ts"] == _t(10)
    assert out[3]["last_purchase_value"] == -1.0
    assert out[4]["last_purchase_ts"] == _t(0)
    assert out[4]["last_purchase_value"] == 5.0
    # the probe-at-purchase row matches itself (>= semantics)
    assert out[2]["last_purchase_ts"] == _t(10)
    # no purchase at all -> epoch/-1 sentinels
    assert out[5]["last_purchase_ts"] == dt.datetime(1970, 1, 1)
    assert out[5]["last_purchase_value"] == -1.0
    assert out[5]["gap_us"] == -1


def test_funnel_orders_stages_strictly(spark):
    rows = [
        # user 7: purchase BEFORE any signup must not count; the one
        # after the full chain does
        (1, _t(0), 7, "purchase", None),
        (2, _t(1), 7, "signup", None),
        (3, _t(2), 7, "view", None),
        (4, _t(3), 7, "click", None),
        (5, _t(4), 7, "purchase", None),
        # user 8: view precedes signup -> only the LATER view counts
        (6, _t(0), 8, "view", None),
        (7, _t(1), 8, "signup", None),
        (8, _t(2), 8, "view", None),
        # user 9: never signs up -> depth 0 despite downstream events
        (9, _t(0), 9, "view", None),
        (10, _t(1), 9, "click", None),
        (11, _t(2), 9, "purchase", None),
    ]
    out = {
        r["user_id"]: r
        for r in event_funnel(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert out[7]["funnel_depth"] == 4
    assert out[7]["first_purchase_ts"] == _t(4)  # not the pre-signup one
    assert out[7]["funnel_lag_us"] == 3 * 60 * 1_000_000
    assert out[8]["funnel_depth"] == 2
    assert out[8]["first_view_ts"] == _t(2)  # not the pre-signup view
    assert out[9]["funnel_depth"] == 0
    assert out[9]["funnel_lag_us"] == -1
    assert out[9]["signup_ts"] == dt.datetime(1970, 1, 1)


# ---------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_STAGES = ["signup", "view", "click", "purchase"]

_events = st.lists(
    st.tuples(
        st.integers(0, 2),                      # user
        st.integers(0, 59),                     # minute
        st.sampled_from(_STAGES + ["error"]),   # type (incl. noise)
    ),
    min_size=1,
    max_size=25,
)


def _py_funnel(rows):
    """Pure-Python first-touch funnel reference (strictly ordered by
    (ts, event_id) per user, stage k gated on first reach of k-1)."""
    out = {}
    by_user = {}
    for eid, (u, m, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((m, eid, ty))
    for u, evs in by_user.items():
        reach = [None] * 4  # first-reach minute per stage
        for m, _eid, ty in sorted(evs):
            for k, stage in enumerate(_STAGES):
                if ty != stage:
                    continue
                if (k == 0 or reach[k - 1] is not None) and reach[k] is None:
                    reach[k] = m
        depth = 0
        for k in range(4):
            if reach[k] is None:
                break
            depth = k + 1
        out[u] = (depth, reach)
    return out


@settings(
    max_examples=20, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(rows=_events)
def test_q44_funnel_property(spark, rows):
    """event_funnel equals the pure-Python gated-first-touch reference
    for arbitrary event streams (same-minute collisions resolve by
    event_id in both, noise event types ignored)."""
    data = [
        (eid, _t(m), u, ty, None) for eid, (u, m, ty) in enumerate(rows)
    ]
    got = {
        r["user_id"]: r
        for r in event_funnel(spark.createDataFrame(data, SCHEMA)).collect()
    }
    want = _py_funnel(rows)
    assert set(got) == set(want)
    for u, (depth, reach) in want.items():
        assert got[u]["funnel_depth"] == depth, (u, rows)
        for k, col in enumerate(
            ["signup_ts", "first_view_ts", "first_click_ts",
             "first_purchase_ts"]
        ):
            exp = (
                _t(reach[k]) if reach[k] is not None
                else dt.datetime(1970, 1, 1)
            )
            assert got[u][col] == exp, (u, col, rows)


def test_q48_zorder_locality_contract(spark):
    """q48: every 256-z-value bucket covers exactly one 16x16 tile —
    the two-dimensional pruning guarantee — and a pure-Python Morton
    reference reproduces every bucket's count and rectangle."""
    from collections import defaultdict

    from pdf_ocr_spark.queries.analytics_ext import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["q48_zorder_layout"](spark, sf).collect()

    import duckdb

    pts = duckdb.sql(
        f"SELECT CAST(o_custkey % 256 AS INTEGER),"
        f" CAST(o_orderkey % 256 AS INTEGER)"
        f" FROM '{sf}/orders.parquet'"
    ).fetchall()

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    ref = defaultdict(list)
    for x, y in pts:
        ref[morton(x, y) // 256].append((x, y))
    assert len(rows) == len(ref)
    for r in rows:
        got = ref[r["bucket"]]
        assert r["n_rows"] == len(got)
        xs = [p[0] for p in got]
        ys = [p[1] for p in got]
        assert (r["min_x"], r["max_x"]) == (min(xs), max(xs))
        assert (r["min_y"], r["max_y"]) == (min(ys), max(ys))
        # locality: the bucket's rectangle stays inside one 16x16 tile
        assert r["max_x"] - r["min_x"] < 16 and r["min_x"] // 16 == r["max_x"] // 16
        assert r["max_y"] - r["min_y"] < 16 and r["min_y"] // 16 == r["max_y"] // 16


def test_q49_salted_join_equals_plain_and_salts_the_key(spark):
    """q49: the salted plan's join key is the composite (skew_key,
    salt) — the hot key spreads across sub-partitions — while the
    result is row-identical to the plain unsalted Spark join."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.queries.analytics_ext import QUERIES, _Q49_SALTS

    sf = "/root/testdata/sf0.001"
    salted = QUERIES["q49_salted_skew_join"](spark, sf)

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan, plan  # composite join/partition key in use

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0).cast("long"))
        .otherwise((F.col("l_orderkey") % 1000).cast("long"))
        .alias("skew_key"),
        "l_quantity",
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("skew_key"),
        (F.col("id") * 7 % 100).cast("int").alias("attr"),
    )
    plain = (
        fact.join(dim, "skew_key")
        .groupBy("skew_key", "attr")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
    )
    key = lambda r: r["skew_key"]  # noqa: E731
    got = sorted(salted.collect(), key=key)
    exp = sorted(plain.collect(), key=key)
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]
    # the hot key really is hot (70% of rows) and really is salted:
    # every salt value appears on the hot key's fact side
    hot = [r for r in got if r["skew_key"] == 0]
    assert len(hot) == 1
    n_total = sum(r["n_items"] for r in got)
    assert hot[0]["n_items"] > 0.6 * n_total
    li_salts = (
        li.select(
            ((F.col("l_orderkey") + F.col("l_linenumber")) % _Q49_SALTS)
            .alias("salt")
        )
        .distinct()
        .count()
    )
    assert li_salts == _Q49_SALTS


def test_q50_cube_matches_decimal_reference(spark):
    """q50: every CUBE cell (including the three aggregated margins
    and the grand total) matches a Decimal-exact Python reference,
    and the GROUPING flags mark exactly the aggregated-away keys."""
    from collections import defaultdict
    from decimal import Decimal

    import duckdb

    from pdf_ocr_spark.queries.analytics_ext import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["q50_grouping_cube"](spark, sf).collect()

    src = duckdb.sql(
        f"SELECT l_returnflag, l_linestatus, l_quantity,"
        f" l_extendedprice, l_discount FROM '{sf}/lineitem.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [Decimal(0), Decimal(0), 0])
    for rf, ls, qty, px, disc in src:
        q2 = Decimal(str(qty)).quantize(Decimal("0.01"))
        rev = Decimal(str(px * (1 - disc))).quantize(
            Decimal("0.000001")
        )
        for key in [(rf, ls), (rf, None), (None, ls), (None, None)]:
            a = agg[key]
            a[0] += q2
            a[1] += rev
            a[2] += 1
    assert len(rows) == len(agg)
    for r in rows:
        key = (
            None if r["g_rf"] else r["rf"],
            None if r["g_ls"] else r["ls"],
        )
        exp = agg[key]
        assert (r["rf"] == "<all>") == bool(r["g_rf"])
        assert (r["ls"] == "<all>") == bool(r["g_ls"])
        assert r["sum_qty"] == float(exp[0]), key
        assert r["revenue"] == float(exp[1]), key
        assert r["n_items"] == exp[2], key


def test_q51_pivot_round_trips_the_melt(spark):
    """q51: pivoting q36's long form reproduces the original part
    columns exactly (melt -> pivot = identity), with the explicit
    value list in the executed plan (no distinct-discovery job)."""
    import duckdb

    from pdf_ocr_spark.queries.analytics_ext import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        r["p_partkey"]: r
        for r in QUERIES["q51_pivot_part_metrics"](spark, sf).collect()
    }
    src = duckdb.sql(
        f"SELECT p_partkey, p_size, p_retailprice"
        f" FROM '{sf}/part.parquet'"
    ).fetchall()
    assert len(rows) == len(src)
    for k, size, price in src:
        r = rows[k]
        assert r["p_size"] == float(size)
        assert r["p_retailprice"] == float(price)
        assert r["n_metrics"] == 2


def test_q52_roots_match_python_walk(spark):
    """q52: root and depth for every node match a direct Python parent
    walk of the same md5 forest; depth spread proves multi-round
    iteration ran."""
    import hashlib

    from pdf_ocr_spark.queries.analytics_ext import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        r["node"]: r
        for r in QUERIES["q52_transitive_roots"](spark, sf).collect()
    }

    def parent(n):
        if n == 0 or n % 7 == 0:
            return None
        return int(hashlib.md5(str(n).encode()).hexdigest()[:8], 16) % n

    assert len(rows) == 500
    max_depth = 0
    for n in range(500):
        cur, depth = n, 0
        while parent(cur) is not None:
            cur = parent(cur)
            depth += 1
        r = rows[n]
        assert (r["root"], r["depth"]) == (cur, depth), n
        max_depth = max(max_depth, depth)
    assert max_depth >= 2, "forest must exercise multi-round iteration"


def test_q53_pointer_doubling_matches_q52(spark):
    """q53 (pointer doubling, O(log depth) rounds) emits exactly q52's
    (node, root, depth) relation — the two iterative formulations
    cross-check each other on the same md5 forest."""
    from pdf_ocr_spark.queries.analytics_ext import QUERIES

    sf = "/root/testdata/sf0.001"
    walked = {
        r["node"]: (r["root"], r["depth"])
        for r in QUERIES["q52_transitive_roots"](spark, sf).collect()
    }
    doubled = {
        r["node"]: (r["root"], r["depth"])
        for r in QUERIES["q53_pointer_doubling_roots"](spark, sf).collect()
    }
    assert doubled == walked


def test_q54_skyline_matches_bruteforce_dominance(spark):
    """q54: the per-brand skyline equals the O(N^2) dominance
    definition computed directly in Python (minimize price cents,
    maximize size; strict dominance)."""
    import duckdb

    from pdf_ocr_spark.queries.analytics_ext import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r["p_brand"], r["p_partkey"])
        for r in QUERIES["q54_pareto_skyline"](spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT p_brand, p_partkey,"
        f" CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT), p_size"
        f" FROM '{sf}/part.parquet'"
    ).fetchall()
    by_brand = {}
    for b, k, c, s in rows:
        by_brand.setdefault(b, []).append((k, c, s))
    expect = set()
    for b, parts in by_brand.items():
        for k, c, s in parts:
            dominated = any(
                (c2 <= c and s2 >= s and (c2 < c or s2 > s))
                for _k2, c2, s2 in parts
            )
            if not dominated:
                expect.add((b, k))
    assert got == expect
    assert len(expect) < len(rows), "skyline must prune something"


def test_t32_weighted_sample_matches_python_aes(spark):
    """t32: the A-ES weighted sample matches a Python replication of
    the micro-frozen key, and the sample is length-biased (mean
    weight well above the corpus mean)."""
    import hashlib
    import math

    import duckdb

    from pdf_ocr_spark.queries.textstats import QUERIES, _T32_K

    sf = "/root/testdata/sf0.001"
    got = [
        (r["sample_rank"], r["doc_id"], r["weight"], r["key_micro"])
        for r in QUERIES["t32_weighted_sample"](spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()
    keyed = []
    for doc_id, n_chars in rows:
        h = int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 4294967296.0
        key = math.floor(1_000_000 * math.log(u) / max(n_chars, 1))
        keyed.append((-key, doc_id, n_chars, key))
    keyed.sort()
    expect = [
        (i + 1, d, w, k)
        for i, (_nk, d, w, k) in enumerate(keyed[:_T32_K])
    ]
    assert sorted(got) == expect
    # weighting effect: the weighted sample's mean weight must exceed
    # that of the UNWEIGHTED control drawn from the same hash stream
    # (w=1 for all docs -> top-k by ln(u) alone)
    control = sorted(
        (
            -math.floor(
                1_000_000
                * math.log(
                    (
                        int(
                            hashlib.md5(str(d).encode()).hexdigest()[:8],
                            16,
                        )
                        + 1
                    )
                    / 4294967296.0
                )
            ),
            d,
            w,
        )
        for d, w in rows
    )[:_T32_K]
    sample_mean = sum(w for _r, _d, w, _k in got) / len(got)
    control_mean = sum(w for _nk, _d, w in control) / len(control)
    corpus_mean = sum(w for _d, w in rows) / len(rows)
    assert sample_mean > control_mean, (sample_mean, control_mean)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_q55_sequence_pattern_matches_python_scan(spark):
    """q55: match counts and first-match ids equal a direct Python
    scan of each user's ordered event stream; at least one user has
    multiple matches."""
    import duckdb

    from pdf_ocr_spark.queries.windows import QUERIES

    sf = "/root/testdata/sf0.01"
    got = {
        r["user_id"]: (r["n_matches"], r["first_match_event_id"])
        for r in QUERIES["q55_sequence_pattern"](spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type"
        f" FROM '{sf}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    streams = {}
    for u, ts, eid, et in rows:
        streams.setdefault(u, []).append((eid, et))
    expect = {}
    for u, evs in streams.items():
        hits = [
            evs[i][0]
            for i in range(2, len(evs))
            if (evs[i][1], evs[i - 1][1], evs[i - 2][1])
            == ("purchase", "click", "view")
        ]
        if hits:
            expect[u] = (len(hits), hits[0])
    assert got == expect
    assert any(n > 1 for n, _e in expect.values())


def test_q56_triangles_match_python_reference(spark):
    """q56: degrees, per-node triangle counts, and clustering
    coefficients match a Python recomputation from the collected d02
    pair graph; both a triangle and a chain occur."""
    from pdf_ocr_spark.queries.analytics_ext import QUERIES
    from pdf_ocr_spark.queries.dedup import QUERIES as DQ

    sf = "/root/testdata/sf0.001"
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DQ["d02_minhash_lsh_dedup"](spark, sf).collect()
    }
    got = {
        r["doc_id"]: (
            r["degree"], r["n_triangles"], r["clustering_ppm"]
        )
        for r in QUERIES["q56_triangle_census"](spark, sf).collect()
    }
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tri = defaultdict(int)
    for a, b in pairs:
        for c in nbrs[a] & nbrs[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    # each triangle touched via its 3 edges -> counted 3x per node
    expect = {}
    for node, ns in nbrs.items():
        d = len(ns)
        t3 = tri[node] // 3
        cc = (
            0 if d < 2 else 1_000_000 * 2 * t3 // (d * (d - 1))
        )
        expect[node] = (d, t3, cc)
    assert got == expect
    assert any(t3 > 0 for _d, t3, _c in got.values())
    # the near-dup graph is transitively dense where it matters:
    # fully-closed nodes exist alongside degree-1 leaves
    assert any(c == 1_000_000 for _d, _t, c in got.values())
    assert any(d == 1 for d, _t, _c in got.values())


def test_two_phase_topk_partition_invariant_and_exact(spark):
    """base.two_phase_topk: identical output under any physical
    partitioning, equal to the naive global sort top-k (score DESC,
    id ASC), ranks 1..k dense, extras carried through."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.queries.base import two_phase_topk

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 37 % 101).alias("score"),  # heavy ties
        (F.col("id") % 7).alias("tag"),
    )
    naive = [
        (r["doc_id"], r["tag"], i + 1)
        for i, r in enumerate(
            df.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(25)
            .collect()
        )
    ]
    outs = []
    for parts in (1, 3, 8, 32):
        got = sorted(
            (r["doc_id"], r["tag"], r["rk"])
            for r in two_phase_topk(
                df.repartition(parts),
                25,
                "score",
                "doc_id",
                "rk",
                extras=("tag",),
            ).collect()
        )
        outs.append(got)
    assert all(o == outs[0] for o in outs)
    assert outs[0] == sorted(naive)
