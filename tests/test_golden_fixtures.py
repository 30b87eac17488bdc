"""Reference-derived golden fixtures: hand-encoded documents with
LITERAL expected (kind, text, media_ref, order) sequences.

These break the "kernel is its own oracle" loop: each fixture mirrors a
deterministic test case of the reference (docpact
tests/test_deterministic.py, tests/test_table_runs.py semantics,
re-expressed at span level since this engine dropped the pipe-table IR),
and the expected output is hard-coded by hand — a kernel-semantics bug
cannot silently pass here.

Layout conventions: y pitch 20 (cluster tol 8), columns 170 apart (the
side-by-side x-cut cannot fire on uniform gaps), title at y=50 (outside
pre-header adjacency of tables at y>=150).
"""

from __future__ import annotations

import pytest

from pdf_ocr_spark.kernels.pdfish import extract_pdfish


def P(page, y, x):
    return page * 1_000_000 + y * 1_000 + x


def T(text, y, x, page=0):
    return ("pdf_text", text, "", P(page, y, x))


def M(ref, y, x, page=0):
    return ("media", "", ref, P(page, y, x))


X0, X1, X2 = 10, 180, 350

FIXTURES = {
    # docpact test_deterministic.py:45-55 (basic flat table) at span level
    "flat_basic": (
        [
            T("Intro line", 50, X0),
            T("A", 150, X0), T("B", 150, X1), T("C", 150, X2),
            T("1", 170, X0), T("2", 170, X1), T("3", 170, X2),
            T("4", 190, X0), T("5", 190, X1), T("6", 190, X2),
        ],
        [
            ("text", "Intro line", ""),
            ("heading", "A", ""), ("heading", "B", ""), ("heading", "C", ""),
            ("cell", "1", ""), ("cell", "2", ""), ("cell", "3", ""),
            ("cell", "4", ""), ("cell", "5", ""), ("cell", "6", ""),
        ],
    ),
    # test_deterministic.py:63-70: aggregation row (single numeric span)
    # stays attached to the run (numeric continuation, compress.py:1192)
    "aggregation_row": (
        [
            T("Port", 150, X0), T("Tonnage", 150, X1),
            T("Albany", 170, X0), T("1,200", 170, X1),
            T("Kwinana", 190, X0), T("2,300", 190, X1),
            T("3,500", 210, X1),
        ],
        [
            ("heading", "Port", ""), ("heading", "Tonnage", ""),
            ("cell", "Albany", ""), ("cell", "1,200", ""),
            ("cell", "Kwinana", ""), ("cell", "2,300", ""),
            ("cell", "3,500", ""),
        ],
    ),
    # test_deterministic.py:72-94: section labels between table segments
    "sectioned": (
        [
            T("GERALDTON", 150, X0),
            T("Vessel", 170, X0), T("Qty", 170, X1),
            T("Star", 190, X0), T("1,000", 190, X1),
            T("Moon", 210, X0), T("2,000", 210, X1),
            T("ALBANY", 250, X0),
            T("Vessel", 270, X0), T("Qty", 270, X1),
            T("Sun", 290, X0), T("3,000", 290, X1),
            T("Sky", 310, X0), T("4,000", 310, X1),
        ],
        [
            ("section", "GERALDTON", ""),
            ("heading", "Vessel", ""), ("heading", "Qty", ""),
            ("cell", "Star", ""), ("cell", "1,000", ""),
            ("cell", "Moon", ""), ("cell", "2,000", ""),
            ("section", "ALBANY", ""),
            ("heading", "Vessel", ""), ("heading", "Qty", ""),
            ("cell", "Sun", ""), ("cell", "3,000", ""),
            ("cell", "Sky", ""), ("cell", "4,000", ""),
        ],
    ),
    # test_deterministic.py:101-114: repeated header (re-header) rows are
    # consumed, their sections' data joins the same table
    "reheader_skip": (
        [
            T("A", 150, X0), T("B", 150, X1),
            T("x", 170, X0), T("1", 170, X1),
            T("y", 190, X0), T("2", 190, X1),
            T("A", 210, X0), T("B", 210, X1),
            T("z", 230, X0), T("3", 230, X1),
            T("w", 250, X0), T("4", 250, X1),
        ],
        [
            ("heading", "A", ""), ("heading", "B", ""),
            ("cell", "x", ""), ("cell", "1", ""),
            ("cell", "y", ""), ("cell", "2", ""),
            ("cell", "z", ""), ("cell", "3", ""),
            ("cell", "w", ""), ("cell", "4", ""),
        ],
    ),
    # compress.py:1762-1803 + interpret.py:1738-1816: transposed table is
    # de-transposed — labels become the header row, one record per data
    # column
    "transposed": (
        [
            T("Vessel", 150, X0), T("Star", 150, X1),
            T("Port", 170, X0), T("Albany", 170, X1),
            T("Tonnage", 190, X0), T("5,000", 190, X1),
        ],
        [
            ("heading", "Vessel", ""), ("heading", "Port", ""),
            ("heading", "Tonnage", ""),
            ("cell", "Star", ""), ("cell", "Albany", ""),
            ("cell", "5,000", ""),
        ],
    ),
    # compress.py:1390-1466: period-2 records merge into one row each,
    # same-column values space-joined
    "multirow_merge": (
        [
            T("Port", 150, X0), T("Vessel", 150, X1), T("Qty", 150, X2),
            T("Albany", 170, X0), T("Star", 170, X1), T("1,000", 170, X2),
            T("10:30", 190, X0), T("11:45", 190, X1),
            T("Kwinana", 210, X0), T("Moon", 210, X1), T("2,000", 210, X2),
            T("12:15", 230, X0), T("13:05", 230, X1),
            T("Albany", 250, X0), T("Sun", 250, X1), T("3,000", 250, X2),
            T("14:20", 270, X0), T("15:10", 270, X1),
            T("Bunbury", 290, X0), T("Sky", 290, X1), T("4,000", 290, X2),
            T("16:40", 310, X0), T("17:55", 310, X1),
        ],
        [
            ("heading", "Port", ""), ("heading", "Vessel", ""),
            ("heading", "Qty", ""),
            ("cell", "Albany 10:30", ""), ("cell", "Star 11:45", ""),
            ("cell", "1,000", ""),
            ("cell", "Kwinana 12:15", ""), ("cell", "Moon 13:05", ""),
            ("cell", "2,000", ""),
            ("cell", "Albany 14:20", ""), ("cell", "Sun 15:10", ""),
            ("cell", "3,000", ""),
            ("cell", "Bunbury 16:40", ""), ("cell", "Sky 17:55", ""),
            ("cell", "4,000", ""),
        ],
    ),
    # compress.py:1111-1137 + 2026-2060: two-span non-table rows render
    # as 'key: value' lines (values at unaligned x never form a run)
    "kv_pairs": (
        [
            T("Report date", 150, X0), T("2026-01-05", 150, 300),
            T("Prepared by", 170, X0), T("Bureau", 170, 410),
        ],
        [
            ("text", "Report date: 2026-01-05", ""),
            ("text", "Prepared by: Bureau", ""),
        ],
    ),
    # filter.py:40-56 + empty-span drop: footnotes and blank spans vanish
    "drops": (
        [
            T("Body text here", 150, X0),
            T("   ", 200, X0),
            T("* Note: dropped footnote", 950, X0),
            T("Source: dropped bureau", 970, X0),
        ],
        [
            ("text", "Body text here", ""),
        ],
    ),
    # compress.py:1885-1934: side-by-side tables split at the voted gap;
    # left block renders fully before the right block
    "side_by_side": (
        [
            T("L1", 150, 10), T("L2", 150, 120),
            T("a", 170, 10), T("1", 170, 120),
            T("b", 190, 10), T("2", 190, 120),
            T("R1", 150, 600), T("R2", 150, 710),
            T("c", 170, 600), T("3", 170, 710),
            T("d", 190, 600), T("4", 190, 710),
        ],
        [
            ("heading", "L1", ""), ("heading", "L2", ""),
            ("cell", "a", ""), ("cell", "1", ""),
            ("cell", "b", ""), ("cell", "2", ""),
            ("heading", "R1", ""), ("heading", "R2", ""),
            ("cell", "c", ""), ("cell", "3", ""),
            ("cell", "d", ""), ("cell", "4", ""),
        ],
    ),
    # compress.py:1810-1878: a short label row directly above the run,
    # aligned to a column anchor, joins the header block — and stacks
    # into a compound " / " name with the in-run leaf header below it
    # (compress.py:2534-2552 + _build_stacked_headers 1549-1644)
    "preceding_header": (
        [
            T("Exports", 150, X0),
            T("Port", 170, X0), T("Qty", 170, X1),
            T("Albany", 190, X0), T("1,000", 190, X1),
            T("Kwinana", 210, X0), T("2,000", 210, X1),
        ],
        [
            ("heading", "Exports / Port", ""), ("heading", "Qty", ""),
            ("cell", "Albany", ""), ("cell", "1,000", ""),
            ("cell", "Kwinana", ""), ("cell", "2,000", ""),
        ],
    ),
    # H7 (compress.py:1469-1509, verified against the reference source):
    # the bottom-2/3 span-count signature marks every row ABOVE the
    # first data-like count as header. The partial top row (2 spans vs
    # the 3-span data signature) is a header; a second header row that
    # has the SAME span count as data is — faithfully to the reference —
    # classified as data (H7 is count-based, not content-based).
    "stacked_headers": (
        [
            T("Spring", 150, X1), T("Winter", 150, X2),
            T("Region", 170, X0), T("2025", 170, X1), T("2026", 170, X2),
            T("North", 190, X0), T("10", 190, X1), T("20", 190, X2),
            T("South", 210, X0), T("30", 210, X1), T("40", 210, X2),
            T("East", 230, X0), T("50", 230, X1), T("60", 230, X2),
            T("West", 250, X0), T("70", 250, X1), T("80", 250, X2),
        ],
        [
            ("heading", "Spring", ""), ("heading", "Winter", ""),
            ("cell", "Region", ""), ("cell", "2025", ""),
            ("cell", "2026", ""),
            ("cell", "North", ""), ("cell", "10", ""), ("cell", "20", ""),
            ("cell", "South", ""), ("cell", "30", ""), ("cell", "40", ""),
            ("cell", "East", ""), ("cell", "50", ""), ("cell", "60", ""),
            ("cell", "West", ""), ("cell", "70", ""), ("cell", "80", ""),
        ],
    ),
    # compress.py:1316-1325: a multi-span prose row (avg span length
    # > 2x median) is flowing text — it terminates the run and renders
    # as text, never as table cells
    "flowing_text": (
        [
            T("Port", 150, X0), T("Qty", 150, X1),
            T("Albany", 170, X0), T("1,000", 170, X1),
            T("Kwinana", 190, X0), T("2,000", 190, X1),
            T("This is a long flowing sentence fragment", 210, X0),
            T("and this is its equally long continuation", 210, X1),
        ],
        [
            ("heading", "Port", ""), ("heading", "Qty", ""),
            ("cell", "Albany", ""), ("cell", "1,000", ""),
            ("cell", "Kwinana", ""), ("cell", "2,000", ""),
            ("text", "This is a long flowing sentence fragment", ""),
            ("text", "and this is its equally long continuation", ""),
        ],
    ),
    # media spans interleave at their reading-order position
    "media_interleave": (
        [
            T("Caption above", 150, X0),
            M("img://fix/1", 200, X1),
            T("Caption below", 260, X0),
        ],
        [
            ("text", "Caption above", ""),
            ("media", "", "img://fix/1"),
            ("text", "Caption below", ""),
        ],
    ),
    # multi-page: pages render in ascending order, offsets re-sequence
    "two_pages": (
        [
            T("Page two line", 100, X0, page=1),
            T("Page one line", 100, X0, page=0),
        ],
        [
            ("text", "Page one line", ""),
            ("text", "Page two line", ""),
        ],
    ),
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_golden_fixture(name):
    spans, expected = FIXTURES[name]
    out, _metrics = extract_pdfish(spans)
    assert [(k, t, r) for k, t, r, _o in out] == expected, name
    assert [o for _k, _t, _r, o in out] == list(range(len(expected))), name
