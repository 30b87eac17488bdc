"""Contract-validation operator: rule compilation + assert columns."""

from __future__ import annotations

import pytest

from pdf_ocr_spark.operators.validation import (
    compile_contract,
    validate,
    violation_histogram,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "en", "src1", 100),
            (2, "xx", "src2", 100),     # bad lang
            (3, "en", "nope", 100),     # bad source pattern
            (4, "en", None, 100),       # null source
            (5, "en", "src9", 9999),    # out of range
            (6, None, "src1", 10),      # null lang AND too short
        ],
        "doc_id long, lang string, source string, n_chars long",
    )


CONTRACT = {
    "lang": {"valid_values": ["en", "de"], "not_null": True},
    "source": {"pattern": r"src\d+", "not_null": True},
    "n_chars": {"min": 50, "max": 400},
}


def test_rule_count(spark):
    assert len(compile_contract(CONTRACT)) == 6


def test_validate_flags_and_violations(spark, df):
    out = {r.doc_id: r for r in validate(df, CONTRACT).collect()}
    assert out[1].valid and out[1].violations == []
    assert out[2].violations == ["lang.valid_values"]
    assert out[3].violations == ["source.pattern"]
    # null value: pattern rule passes (absence gated by not_null only)
    assert out[4].violations == ["source.not_null"]
    assert out[5].violations == ["n_chars.max"]
    assert out[6].violations == ["lang.not_null", "n_chars.min"]
    assert out[6].n_violations == 2 and not out[6].valid


def test_hard_gate_mode(spark, df):
    kept = validate(df, CONTRACT, keep_invalid=False)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert kept.columns == df.columns  # assert columns stripped


def test_histogram(spark, df):
    h = {
        r.violation: r.n_docs
        for r in violation_histogram(validate(df, CONTRACT)).collect()
    }
    assert h == {
        "lang.valid_values": 1,
        "source.pattern": 1,
        "source.not_null": 1,
        "n_chars.max": 1,
        "lang.not_null": 1,
        "n_chars.min": 1,
    }


def test_v05_psi_matches_python_reference_and_flags_drift(spark, tmp_path):
    """v05: injected event-type drift (mix flips between halves) is
    flagged, stable dimensions are not, and every PSI value matches a
    pure-Python reference with identical smoothing + micro rounding."""
    import math
    from collections import Counter
    from datetime import datetime, timedelta

    import pandas as pd

    n = 3000
    rows = []
    for i in range(n):
        base = i < n // 2
        day = (i * 7) % 15 + (1 if base else 16)
        ts = datetime(2024, 1, day, hour=(i * 11) % 24) + timedelta(
            minutes=i % 60
        )
        # drifted: event mix flips from click-heavy to error-heavy
        if base:
            et = ["click", "click", "click", "view", "error"][i % 5]
        else:
            et = ["error", "error", "error", "view", "click"][i % 5]
        rows.append(
            {
                "event_id": i,
                "ts": ts,
                "user_id": i % 37,
                "event_type": et,
                "value": float((i * 13) % 500) + 0.5,
                "props": "",
            }
        )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(str(tmp_path / "events.parquet"))

    def bins_of(r, name):
        if name == "event_type":
            return r["event_type"]
        if name == "value_bin":
            return str(min(9, int(r["value"] // 50)))
        if name == "hour":
            return str(r["ts"].hour)
        if name == "dow":
            return str((r["ts"].weekday() + 1) % 7)  # Sunday=0
        raise AssertionError(name)

    expected = {}
    for name in ("event_type", "value_bin", "hour", "dow"):
        nb = Counter(
            bins_of(r, name) for r in rows if r["ts"].day <= 15
        )
        nc = Counter(bins_of(r, name) for r in rows if r["ts"].day > 15)
        keys = sorted(set(nb) | set(nc))
        k = len(keys)
        n_base, n_curr = sum(nb.values()), sum(nc.values())
        tot = 0
        for key in keys:
            p = (nb[key] + 1) / (n_base + k)
            q = (nc[key] + 1) / (n_curr + k)
            tot += round((p - q) * math.log(p / q) * 1000000)
        expected[name] = (k, n_base, n_curr, tot)

    from pdf_ocr_spark.queries.validation_q import QUERIES

    got = {
        r["col_name"]: r
        for r in QUERIES["v05_drift_psi"](spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expected)
    for name, (k, n_base, n_curr, tot) in expected.items():
        r = got[name]
        assert (r["n_bins"], r["n_base"], r["n_curr"]) == (
            k,
            n_base,
            n_curr,
        ), name
        assert r["psi_micro"] == tot, name
        assert r["drifted"] == (tot > 200000), name
    assert got["event_type"]["drifted"] is True
    assert got["value_bin"]["drifted"] is False


def test_v06_fk_audit_counts_orphans_exactly(spark):
    """v06: the damaged edge's orphan count equals the exact number of
    orders whose customer key is divisible by 97, the intact edges
    report zero orphans, and the micro rate is the floor division."""
    import pandas as pd

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        r["edge"]: r
        for r in QUERIES["v06_fk_audit"](spark, sf).collect()
    }
    assert len(rows) == 7
    for edge, r in rows.items():
        if edge.endswith("~damaged"):
            continue
        assert r["n_orphans"] == 0 and r["ok"], edge

    orders = pd.read_parquet(f"{sf}/orders.parquet")
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    removed = set(cust.c_custkey[cust.c_custkey % 97 == 0])
    expected = int(orders.o_custkey.isin(removed).sum())
    dmg = rows["orders->customer~damaged"]
    assert dmg["n_orphans"] == expected > 0
    assert not dmg["ok"]
    assert (
        dmg["orphan_rate_micro"]
        == (expected * 1000000) // len(orders)
    )


def test_v07_snapshot_diff_matches_dict_reference(spark):
    """v07: the CDC changelog (op, changed-cols, old/new values) matches
    a plain-Python dict diff of the same two derived snapshots."""
    import pandas as pd

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = pd.read_parquet(f"{sf}/orders.parquet")

    old = {
        int(r.o_orderkey): (r.o_orderstatus, r.o_orderpriority)
        for r in orders.itertuples()
        if r.o_orderkey % 101 != 0
    }
    new = {
        int(r.o_orderkey): (
            "X" if r.o_orderkey % 11 == 0 else r.o_orderstatus,
            "9-SYNTH" if r.o_orderkey % 7 == 0 else r.o_orderpriority,
        )
        for r in orders.itertuples()
        if r.o_orderkey % 103 != 0
    }
    exp = {}
    for k in old.keys() | new.keys():
        if k not in old:
            exp[k] = ("I", "")
        elif k not in new:
            exp[k] = ("D", "")
        elif old[k] != new[k]:
            cols = []
            if old[k][0] != new[k][0]:
                cols.append("o_orderstatus")
            if old[k][1] != new[k][1]:
                cols.append("o_orderpriority")
            exp[k] = ("U", ",".join(cols))
    assert {op for op, _ in exp.values()} == {"I", "D", "U"}

    rows = {
        r["o_orderkey"]: r
        for r in QUERIES["v07_snapshot_diff"](spark, sf).collect()
    }
    assert set(rows) == set(exp)
    for k, (op, cols) in exp.items():
        r = rows[k]
        assert (r["op"], r["changed_cols"]) == (op, cols), k
        if op == "U":
            assert (r["old_status"], r["old_priority"]) == old[k]
            assert (r["new_status"], r["new_priority"]) == new[k]


def test_v08_apply_roundtrip_equals_new_snapshot(spark):
    """v08: applying v07's changelog to OLD reconstructs NEW exactly
    (row-for-row, including keys absent from both snapshots)."""
    import pandas as pd

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    exp = {
        int(r.o_orderkey): (
            "X" if r.o_orderkey % 11 == 0 else r.o_orderstatus,
            "9-SYNTH" if r.o_orderkey % 7 == 0 else r.o_orderpriority,
        )
        for r in orders.itertuples()
        if r.o_orderkey % 103 != 0
    }
    got = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_orderpriority"])
        for r in QUERIES["v08_cdc_apply"](spark, sf).collect()
    }
    assert got == exp


def test_v09_scd2_matches_dict_reference(spark):
    """v09: the type-2 history matches a dict-based reference and
    satisfies the SCD2 invariants (exactly one open row per live key,
    closed rows end at the next version)."""
    import pandas as pd

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    old = {
        int(r.o_orderkey): (r.o_orderstatus, r.o_orderpriority)
        for r in orders.itertuples()
        if r.o_orderkey % 101 != 0
    }
    new = {
        int(r.o_orderkey): (
            "X" if r.o_orderkey % 11 == 0 else r.o_orderstatus,
            "9-SYNTH" if r.o_orderkey % 7 == 0 else r.o_orderpriority,
        )
        for r in orders.itertuples()
        if r.o_orderkey % 103 != 0
    }
    exp = set()
    for k in old.keys() | new.keys():
        if k in old and k in new and old[k] == new[k]:
            exp.add((k, *old[k], 1, 0, True))
        elif k in old and k in new:
            exp.add((k, *old[k], 1, 2, False))
            exp.add((k, *new[k], 2, 0, True))
        elif k in old:
            exp.add((k, *old[k], 1, 2, False))
        else:
            exp.add((k, *new[k], 2, 0, True))

    rows = QUERIES["v09_scd2_history"](spark, sf).collect()
    got = {
        (r["o_orderkey"], r["o_orderstatus"], r["o_orderpriority"],
         r["ver_from"], r["ver_to"], r["is_current"])
        for r in rows
    }
    assert got == exp
    # invariants: one open row per live key; open <=> ver_to sentinel
    open_keys = [r["o_orderkey"] for r in rows if r["is_current"]]
    assert sorted(open_keys) == sorted(new)
    for r in rows:
        assert r["is_current"] == (r["ver_to"] == 0)


def test_v10_ivm_equals_direct_aggregate(spark):
    """v10: the delta-maintained count view equals the direct GROUP BY
    on the NEW snapshot, and every changelog op class contributes (at
    least one group actually changes its count between snapshots)."""
    import pandas as pd

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    new = orders[orders.o_orderkey % 103 != 0].copy()
    new["o_orderpriority"] = new.apply(
        lambda r: "9-SYNTH" if r.o_orderkey % 7 == 0
        else r.o_orderpriority, axis=1
    )
    exp = new.groupby("o_orderpriority").size().to_dict()

    got = {
        r["o_orderpriority"]: r["n"]
        for r in QUERIES["v10_ivm_counts"](spark, sf).collect()
    }
    assert got == exp
    # the synthetic group only exists post-update: deltas must have
    # created it from nothing (no row in the OLD aggregate)
    old = orders[orders.o_orderkey % 101 != 0]
    assert "9-SYNTH" not in set(old.o_orderpriority)
    assert got["9-SYNTH"] > 0


def test_v11_time_travel_reconstructs_old_snapshot(spark):
    """v11: AS OF version 1 over the SCD2 history equals the OLD
    snapshot exactly."""
    import pandas as pd

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    exp = {
        int(r.o_orderkey): (r.o_orderstatus, r.o_orderpriority)
        for r in orders.itertuples()
        if r.o_orderkey % 101 != 0
    }
    got = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_orderpriority"])
        for r in QUERIES["v11_time_travel"](spark, sf).collect()
    }
    assert got == exp


def test_v12_benford_matches_counter_reference(spark):
    """v12: leading-digit counts, exact ppm shares, and the integer
    chi-square match a Counter reference; price conforms while the
    uniform quantity column violates."""
    import math
    from collections import Counter

    import duckdb

    from pdf_ocr_spark.queries.validation_q import (
        _V12_CHI2_MAX,
        _V12_EXP_PPM,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    src = duckdb.sql(
        f"SELECT l_extendedprice, l_quantity FROM '{sf}/lineitem.parquet'"
    ).fetchall()
    exp = {}
    for col, idx in (("price", 0), ("quantity", 1)):
        c = Counter(
            int(str(int(math.floor(v[idx])))[0])
            for v in src
            if v[idx] >= 1
        )
        n = sum(c.values())
        obs = {d: c.get(d, 0) * 1_000_000 // n for d in range(1, 10)}
        chi = sum(
            (obs[d] - _V12_EXP_PPM[d - 1]) ** 2 // _V12_EXP_PPM[d - 1]
            for d in range(1, 10)
        )
        exp[col] = (c, obs, chi)

    rows = QUERIES["v12_benford_audit"](spark, sf).collect()
    assert len(rows) == 18
    for r in rows:
        c, obs, chi = exp[r["col_name"]]
        assert r["cnt"] == c.get(r["digit"], 0)
        assert r["obs_ppm"] == obs[r["digit"]]
        assert r["exp_ppm"] == _V12_EXP_PPM[r["digit"] - 1]
        assert r["chi2_micro"] == chi
        assert r["conforms"] == (chi <= _V12_CHI2_MAX)
    assert {r["conforms"] for r in rows if r["col_name"] == "quantity"} == {
        False
    }


def test_v13_fd_audit_verdicts(spark):
    """v13: the FD verdicts match a direct Python group check — the
    two true dependencies hold, the three false ones fail with the
    exact violating-group counts."""
    import duckdb

    from pdf_ocr_spark.queries.validation_q import _V13_FDS, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["fd"]: (
            r["n_groups"], r["n_violating"], r["max_rhs"], r["holds"]
        )
        for r in QUERIES["v13_fd_audit"](spark, sf).collect()
    }
    assert set(got) == {fd[0] for fd in _V13_FDS}
    for name, table, lhs, rhs in _V13_FDS:
        groups = {}
        for a, b in duckdb.sql(
            f"SELECT {lhs}, {rhs} FROM '{sf}/{table}.parquet'"
        ).fetchall():
            groups.setdefault(a, set()).add(b)
        n_viol = sum(1 for v in groups.values() if len(v) > 1)
        expect = (
            len(groups),
            n_viol,
            max(len(v) for v in groups.values()),
            n_viol == 0,
        )
        assert got[name] == expect, name
    assert {got[n][3] for n in got} == {True, False}


def test_v14_mad_outliers_match_python_reference(spark):
    """v14: medians, MADs, z-scores and the outlier flags match a
    Python statistics.median reference over the injected cents; the
    injected population is exactly the flagged set."""
    import math
    import statistics

    import duckdb

    from pdf_ocr_spark.queries.validation_q import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["o_orderkey"]: (r["cents"], r["z_milli"], r["outlier"])
        for r in QUERIES["v14_mad_outliers"](spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority,"
        f" CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        f" FROM '{sf}/orders.parquet'"
    ).fetchall()
    groups = {}
    for k, p, c in rows:
        cents = c * (50 if k % 997 == 0 else 1)
        groups.setdefault(p, []).append((k, cents))
    n_out = 0
    for p, members in groups.items():
        med = statistics.median(c for _k, c in members)
        mad = statistics.median(abs(c - med) for _k, c in members)
        for k, c in members:
            z = 0.6745 * abs(c - med) / mad
            expect = (c, math.floor(1000 * z), z > 3.5)
            assert got[k] == expect, k
            n_out += expect[2]
    assert n_out > 0
    assert {k for k, v in got.items() if v[2]} == {
        k for k, _p, _c in rows if k % 997 == 0
    }


def test_v15_histograms_match_python_reference(spark):
    """v15: equi-width bucket math and equi-depth tile counts/bounds
    match a Python recomputation (ties at tile boundaries are
    value-identical, so bounds are tie-insensitive)."""
    import duckdb

    from pdf_ocr_spark.queries.validation_q import (
        _V15_BUCKETS,
        _V15_COLS,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["col_name"], r["kind"], r["bucket"]): (
            r["n_rows"], r["lo"], r["hi"]
        )
        for r in QUERIES["v15_column_histograms"](spark, sf).collect()
    }
    b = _V15_BUCKETS
    n_checked = 0
    for cname, table, expr in _V15_COLS:
        vals = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT {expr} FROM '{sf}/{table}.parquet'"
            ).fetchall()
        )
        mn, mx = vals[0], vals[-1]
        width = {}
        for v in vals:
            k = min(b - 1, b * (v - mn) // (mx - mn))
            lst = width.setdefault(k, [])
            lst.append(v)
        for k, vs in width.items():
            assert got[(cname, "width", k)] == (
                len(vs), min(vs), max(vs)
            ), (cname, k)
            n_checked += 1
        n = len(vals)
        base, extra = divmod(n, b)
        i = 0
        for tile in range(b):
            size = base + (1 if tile < extra else 0)
            vs = vals[i : i + size]
            i += size
            assert got[(cname, "depth", tile)] == (
                len(vs), vs[0], vs[-1]
            ), (cname, tile)
            n_checked += 1
    assert n_checked == len(got)


def test_v16_constraint_suggestion_matches_python_reference(spark):
    """v16: the suggested-constraint set and every batch verdict match
    a pure-Python replication of the profile -> corrupt -> verify
    flow over the raw parquet rows."""
    import duckdb

    from pdf_ocr_spark.queries.validation_q import QUERIES, _V16_SET_MAX

    sf = "/root/testdata/sf0.001"
    got = {
        (r["col_name"], r["kind"]): (
            r["suggested"], r["param"], r["n_violations"], r["verdict"]
        )
        for r in QUERIES["v16_constraint_suggestion"](
            spark, sf
        ).collect()
    }
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority,"
        f" CAST(o_orderdate AS VARCHAR), o_orderstatus,"
        f" CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        f" FROM '{sf}/orders.parquet'"
    ).fetchall()
    n = len(rows)
    keys = [r[0] for r in rows]
    statuses = sorted({r[3] for r in rows})
    lo = min(r[4] for r in rows)
    hi = max(r[4] for r in rows)
    # corrupted batch
    bk = [1 if k % 1021 == 0 else k for k in keys]
    bprio = [None if r[0] % 1013 == 0 else r[1] for r in rows]
    bstat = ["X" if r[0] % 997 == 0 else r[3] for r in rows]
    bcents = [c * 1000 if k % 1009 == 0 else c for k, c in
              ((r[0], r[4]) for r in rows)]
    exp = {
        ("o_orderpriority", "complete"): (
            all(r[1] is not None for r in rows),
            "",
            sum(1 for p in bprio if p is None),
        ),
        ("o_orderstatus", "complete"): (True, "", 0),
        ("o_orderkey", "unique"): (
            len(set(keys)) == n, "", n - len(set(bk)),
        ),
        ("o_totalprice_cents", "range"): (
            True,
            f"{lo}..{hi}",
            sum(1 for c in bcents if c < lo or c > hi),
        ),
        ("o_orderstatus", "in_set"): (
            len(statuses) <= _V16_SET_MAX,
            "|".join(statuses),
            sum(1 for st in bstat if st not in statuses),
        ),
    }
    for key, (sugg, param, viol) in exp.items():
        g = got[key]
        assert g[0] == sugg, key
        assert g[1] == param, key
        assert g[2] == viol, key
        assert g[3] == ("pass" if viol == 0 else "fail"), key
    # the declined candidate: high-cardinality date domain
    dd = got[("o_orderdate", "in_set")]
    assert dd == (False, "", -1, "not_checked")
    assert len(got) == 6
    # every corruption population is live at this SF
    assert exp[("o_orderpriority", "complete")][2] > 0
    assert exp[("o_orderkey", "unique")][2] > 0
    assert exp[("o_totalprice_cents", "range")][2] > 0
    assert exp[("o_orderstatus", "in_set")][2] > 0
