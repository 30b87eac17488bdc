"""Local replica of the round-driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and, where an
oracle_sql() entry exists, the same query on DuckDB over the same parquet
tables; compares row count, column names, and an order-insensitive
value hash (doubles rounded to 6 significant-ish decimals, like any sane
float-tolerant comparator).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v, permissive=False):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (decimal.Decimal,)):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        if permissive:
            return "[" + ",".join(_norm_cell(x, True) for x in v) + "]"
        _reject_non_scalar(v)
    if type(v).__name__ == "ndarray":  # duckdb->pandas list columns
        if permissive:
            return (
                "[" + ",".join(_norm_cell(x, True) for x in v.tolist()) + "]"
            )
        _reject_non_scalar(v)
    if isinstance(v, dict):
        _reject_non_scalar(v)
    return str(v)


def _reject_non_scalar(v):
    # The round-driver's canonicalizer (pandas sort_values ->
    # factorize) dies on unhashable list cells. Mirror its strictness
    # for DRIVER-REGISTERED queries: scalars only (the round-3 t01
    # regression). Fine-grained non-driver entries may carry arrays —
    # they get the permissive stringifying hash instead, so --full
    # sweeps still value-check them.
    raise TypeError(
        f"non-scalar cell {type(v).__name__} in query output — "
        "driver canon cannot hash array/map/struct columns; "
        "project a scalar (e.g. concat_ws) on both engines"
    )


def value_hash(rows: list[dict], permissive: bool = False) -> str:
    cols = sorted(rows[0].keys()) if rows else []
    lines = sorted(
        "|".join(_norm_cell(r[c], permissive) for c in cols) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    import __spark_entry__ as entry
    from pdf_ocr_spark.session import get_spark

    spark = get_spark(app="check-correctness", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    if full:
        from pdf_ocr_spark.queries import FULL_ORACLES, FULL_QUERIES

        queries, oracles = dict(FULL_QUERIES), dict(FULL_ORACLES)
    else:
        queries = entry.queries()
        oracles = entry.oracle_sql()
    failures = []
    driver_names = set(entry.queries())
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            continue
        try:
            orows = con.sql(oracles[name]).df().to_dict("records")
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        scols, ocols = (
            sorted(srows[0].keys()) if srows else sorted(c.name for c in sdf.schema),
            sorted(orows[0].keys()) if orows else [],
        )
        ok_rows = len(srows) == len(orows)
        ok_cols = not (srows and orows) or scols == ocols
        # strict (driver-canon) hash for driver-registered entries;
        # permissive (array-stringifying) hash for fine-grained ones
        permissive = name not in driver_names
        try:
            sh = value_hash(srows, permissive)
            oh = value_hash(orows, permissive)
        except TypeError as e:
            # a driver entry emitting array/map cells: report and keep
            # walking (the sweep must cover the remaining queries)
            failures.append(name)
            print(f"FAIL {name}: canon error: {str(e)[:200]}")
            continue
        ok_hash = sh == oh
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash={'ok' if ok_hash else f'{sh} vs {oh}'} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL" and srows and orows:
            sset = {value_hash([r], permissive) for r in srows}
            oset = {value_hash([r], permissive) for r in orows}
            s_only = [
                r for r in srows if value_hash([r], permissive) not in oset
            ][:3]
            o_only = [
                r for r in orows if value_hash([r], permissive) not in sset
            ][:3]
            for r in s_only:
                print("   spark-only:", {k: r[k] for k in sorted(r)[:8]})
            for r in o_only:
                print("   duck-only: ", {k: r[k] for k in sorted(r)[:8]})
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
