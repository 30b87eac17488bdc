"""Driver-harness contract tests for the 50-entry driver registry.

The round driver canonicalizes each query's output with pandas
(``sort_values`` over every column, then value-factorization) before
hashing.  That canon requires every cell to be hashable — an
``array<string>`` column kills the whole suite with
``TypeError: unhashable type: 'list'`` before any comparison happens
(the round-3 t01 regression: one array column silenced the correctness
signal for ~35 operators).

Two gates, so the failure mode can never recur:

1. Schema gate (cheap, lazy): no driver-registered query may emit an
   ArrayType / MapType / StructType column.  Catches the regression at
   plan-build time without running anything.
2. Canon-replica gate (executes at sf0.001): run every registered
   query, convert to pandas, and push it through a faithful replica of
   the driver's canonicalizer (sort_values over all columns +
   per-cell hashing).  Catches anything the static schema walk can't
   see (e.g. object cells smuggled through a pandas-grain kernel).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _registry():
    from pdf_ocr_spark.queries import ALL_QUERIES

    return ALL_QUERIES


def test_driver_registry_schemas_are_flat(spark):
    """No ArrayType/MapType/StructType column in any driver entry."""
    bad = {}
    for name, fn in _registry().items():
        schema = fn(spark, SF_DIR).schema
        complex_cols = [
            f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        "driver-registered queries emit non-scalar columns the round "
        f"driver cannot canonicalize: {bad}"
    )


def _driver_canon(pdf):
    """Replica of the driver's pandas canonicalizer: sort by every
    column, then hash each cell.  Raises TypeError on unhashable
    (list/dict/ndarray) cells exactly like the real harness."""
    if len(pdf.columns):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    for col in pdf.columns:
        # factorize needs hashable values; hash() is the same contract
        pdf[col].map(lambda v: hash(v) if v is not None else 0)
    return len(pdf)


@pytest.mark.slow
def test_driver_canon_replica_all_entries(spark):
    """Every driver entry survives the driver's pandas canon at
    sf0.001 (executes all ~50 suites; the full-fidelity gate)."""
    failures = {}
    for name, fn in _registry().items():
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            _driver_canon(pdf)
        except Exception as exc:  # noqa: BLE001 — collect, report all
            failures[name] = f"{type(exc).__name__}: {exc}"
    assert not failures, f"driver canon failed for: {failures}"
