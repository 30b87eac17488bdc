"""Unit tests for the compound-header unpivot operator
(operators/unpivot.py — docpact unpivot.py:143-400 semantics)."""

from __future__ import annotations

from pdf_ocr_spark.operators.unpivot import (
    detect_and_unpivot,
    detect_pivot_groups,
)


def test_detect_groups_fuzzy_suffix_merge():
    cols = [
        "port",
        "tonnage / FY 2023",
        "value / FY2023",
        "tonnage / FY 2024",
        "value / FY2024",
    ]
    id_cols, groups = detect_pivot_groups(cols)
    assert id_cols == ["port"]
    # fuzzy variants merged into the first-seen canonical suffix
    assert set(groups) == {"FY 2023", "FY 2024"}
    assert groups["FY 2023"] == {
        "tonnage": "tonnage / FY 2023",
        "value": "value / FY2023",
    }


def test_detect_groups_prefix_collision_blocks_merge():
    # "FY 1995" vs "FY 1996" are 0.857-similar but both carry a
    # 'total' prefix -> must remain separate groups
    cols = ["k", "total / FY 1995", "total / FY 1996"]
    _, groups = detect_pivot_groups(cols)
    assert set(groups) == {"FY 1995", "FY 1996"}


def test_no_compound_headers_is_identity():
    cols = ["a", "b", "c"]
    id_cols, groups = detect_pivot_groups(cols)
    assert id_cols == cols and groups == {}


def test_unpivot_values_and_null_fill(spark):
    df = spark.createDataFrame(
        [("p1", 10.0, 1, 20.0), ("p2", 30.0, 3, 40.0)],
        "port string, `tonnage / FY 2023` double, `value / FY2023` int,"
        " `tonnage / FY 2024` double",  # FY 2024 group lacks 'value'
    )
    out = detect_and_unpivot(df)
    assert out.columns == ["port", "_pivot", "tonnage", "value"]
    rows = {(r["port"], r["_pivot"]): r for r in out.collect()}
    assert rows[("p1", "FY 2023")]["tonnage"] == 10.0
    assert rows[("p1", "FY 2023")]["value"] == 1
    assert rows[("p1", "FY 2024")]["tonnage"] == 20.0
    assert rows[("p1", "FY 2024")]["value"] is None  # missing prefix -> null
    assert len(rows) == 4


def test_unpivot_single_projection_no_shuffle(spark):
    df = spark.createDataFrame(
        [("p1", 1.0, 2.0)],
        "port string, `x / a` double, `x / b` double",
    )
    plan = detect_and_unpivot(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one stack() projection, no shuffle
