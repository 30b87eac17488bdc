"""Deterministic dimension/measure mapping (operators/det_map.py):
phase 2-4 semantics of docpact interpret.py:1335-1618 on an inline
fixture — int+float shared-alias rule, group vs constant dimensions,
shared columns, one record per (row x group)."""

from __future__ import annotations

import pytest

from pdf_ocr_spark.operators.det_map import (
    classify_parts,
    column_roles,
    map_deterministic,
    typed_alias_table,
)

SCHEMA = {
    "region": ("string", []),
    "crop": ("string", ["spring crops", "spring grain"]),
    "unit": ("string", ["th.ha."]),
    "area": ("float", ["th.ha."]),
    "source": ("string", ["plan", "fact"]),
    "year": ("int", ["2025"]),
    "value": ("float", ["2025"]),
}
HEADERS = [
    (0, "Region"),
    (1, "Spring crops / Th.ha."),
    (2, "Spring grain / Th.ha."),
    (3, "Plan / 2025"),
    (4, "Fact / 2025"),
]
RECORD_COLS = ["region", "crop", "unit", "source", "year", "area", "value"]


@pytest.fixture(scope="module")
def fixture(spark):
    headers = spark.createDataFrame(
        [("d1", i, h) for i, h in HEADERS],
        "doc_id string, col_idx int, header string",
    )
    cells = spark.createDataFrame(
        [
            ("d1", 0, 0, "Moscow"),
            ("d1", 0, 1, "120"),
            ("d1", 0, 2, "40"),
            ("d1", 0, 3, "500"),
            ("d1", 0, 4, "510"),
            ("d1", 1, 0, "Kazan"),
            ("d1", 1, 1, "80"),
            # row 1 col 2 missing -> null field in that group's record
            ("d1", 1, 3, "300"),
            ("d1", 1, 4, "290"),
        ],
        "doc_id string, row_id int, col_idx int, cell string",
    )
    aliases = typed_alias_table(spark, SCHEMA)
    return headers, cells, aliases


def test_roles(spark, fixture):
    headers, _cells, aliases = fixture
    r = column_roles(classify_parts(headers, aliases))
    shared = {(x.col_idx, x.canonical) for x in r["shared"].collect()}
    assert shared == {(0, "region")}
    # crop and source vary across headers -> group dims
    assert {x.canonical for x in r["group_names"].collect()} == {
        "crop",
        "source",
    }
    # th.ha. and 2025 each appear twice with one value -> constants;
    # 2025 is a dimension at all only via the int+float rule (year)
    assert {(x.canonical, x.value) for x in r["const_dims"].collect()} == {
        ("unit", "Th.ha."),
        ("year", "2025"),
    }
    assert {x.group_key for x in r["groups"].collect()} == {
        "crop=Spring crops",
        "crop=Spring grain",
        "source=Plan",
        "source=Fact",
    }
    # the float twin of each both-typed alias is the measure
    meas = {
        (x.group_key, x.canonical) for x in r["group_measures"].collect()
    }
    assert meas == {
        ("crop=Spring crops", "area"),
        ("crop=Spring grain", "area"),
        ("source=Plan", "value"),
        ("source=Fact", "value"),
    }


def test_records(spark, fixture):
    headers, cells, aliases = fixture
    out = map_deterministic(cells, headers, aliases, RECORD_COLS)
    rows = {
        (x.row_id, x.group_key): x.asDict() for x in out.collect()
    }
    # 2 data rows x 4 groups
    assert len(rows) == 8
    r = rows[(0, "crop=Spring crops")]
    assert (r["region"], r["crop"], r["unit"], r["year"], r["area"]) == (
        "Moscow", "Spring crops", "Th.ha.", "2025", "120",
    )
    assert r["source"] is None and r["value"] is None
    r = rows[(1, "source=Fact")]
    assert (r["region"], r["source"], r["value"], r["unit"]) == (
        "Kazan", "Fact", "290", "Th.ha.",
    )
    assert r["crop"] is None and r["area"] is None
    # missing cell (row 1, col 2) -> null measure, record still emitted
    r = rows[(1, "crop=Spring grain")]
    assert r["area"] is None and r["crop"] == "Spring grain"
