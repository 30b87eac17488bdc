"""Grid/spreadsheet kernel: merged-cell expansion, hidden row/col skip,
aggregation-row strip, trailing footnote strip, trailing-column trim —
inline fixtures in the reference's unit-test style (docpact
tests/test_xlsx_extractor.py), plus Spark/oracle equality on the grid
corpus."""

from __future__ import annotations

from pdf_ocr_spark.corpus import generate_doc
from pdf_ocr_spark.kernels.gridk import decode_grid_offset, extract_grid_doc


def g(row, col, text, sheet=0, kind="grid_cell", ref=""):
    return (kind, text, ref, sheet * 1_000_000 + row * 1_000 + col)


def kinds_texts(spans):
    return [(k, t) for k, t, _m, _o in spans]


def test_decode_grid_offset():
    assert decode_grid_offset(2_003_004) == (2, 3, 4)


def test_basic_header_and_cells_row_major():
    spans, m = extract_grid_doc(
        [g(1, 1, "10"), g(0, 0, "Port"), g(0, 1, "Tonnage"), g(1, 0, "Albany")]
    )
    assert kinds_texts(spans) == [
        ("heading", "Port"), ("heading", "Tonnage"),
        ("cell", "Albany"), ("cell", "10"),
    ]
    assert [s[3] for s in spans] == [0, 1, 2, 3]
    assert m["dropped"] == 0


def test_merged_cell_expansion_top_left_fills():
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "H1"), g(0, 1, "H2"),
            g(1, 0, "Albany"), g(1, 1, "10"),
            g(2, 1, "20"),  # (2,0) merged from (1,0)
            g(1, 0, "1,0,2,0", kind="grid_merge"),
        ]
    )
    assert ("cell", "Albany") in kinds_texts(spans)
    assert kinds_texts(spans).count(("cell", "Albany")) == 2  # expanded


def test_hidden_rows_and_cols_dropped_with_metrics():
    spans, m = extract_grid_doc(
        [
            g(0, 0, "H1"), g(0, 1, "H2"),
            g(1, 0, "a"), g(1, 1, "1"),
            g(2, 0, "b"), g(2, 1, "2"),
            g(0, 0, "2", kind="grid_hidden_row"),
        ]
    )
    texts = [t for _k, t in kinds_texts(spans)]
    assert "b" not in texts and "2" not in texts
    assert m["drop_reasons"]["hidden_row"] == 2


def test_aggregation_and_footnote_rows_stripped():
    spans, m = extract_grid_doc(
        [
            g(0, 0, "Port"), g(0, 1, "Tonnage"),
            g(1, 0, "Albany"), g(1, 1, "1,000"),
            g(2, 0, "Total"), g(2, 1, "1,000"),
            g(3, 0, "* Note: provisional"),
        ]
    )
    texts = [t for _k, t in kinds_texts(spans)]
    assert "Total" not in texts and all("Note" not in t for t in texts)
    assert m["drop_reasons"]["aggregation_row"] == 2
    assert m["drop_reasons"]["footnote_row"] == 1


def test_trailing_empty_column_trimmed():
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "H1"), g(0, 1, "H2"), g(0, 2, "   "),
            g(1, 0, "a"), g(1, 1, "1"), g(1, 2, " "),
        ]
    )
    assert len(spans) == 4  # the blank third column vanished


def test_media_interleaves_at_row_position():
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "H"), g(1, 0, "a"),
            g(1, 1, "", kind="media", ref="img://x/0"),
            g(2, 0, "b"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "H"), ("cell", "a"), ("media", ""), ("cell", "b"),
    ]
    assert spans[2][2] == "img://x/0"


def test_multi_sheet_order_and_corpus_docs():
    spans, _m = extract_grid_doc(
        [g(0, 0, "B", sheet=1), g(0, 0, "H0"), g(1, 0, "a")]
    )
    assert [t for _k, t in kinds_texts(spans)] == ["H0", "a", "B"]
    # generator smoke: deterministic + kernel-compatible
    for i in range(20):
        doc = generate_doc(f"grid-{i:06d}")
        assert doc == generate_doc(f"grid-{i:06d}")
        out, m = extract_grid_doc(doc)
        assert m["spans_in"] == len(doc)
        assert [s[3] for s in out] == list(range(len(out)))


def test_spark_grid_extraction_matches_oracle(spark):
    from pdf_ocr_spark.extract.pipeline import extract
    from pdf_ocr_spark.extract.schema import INPUT_SCHEMA, span_dicts

    ids = [f"grid-{i:06d}" for i in range(30)]
    rows = [
        {"doc_id": d, "spans": span_dicts(generate_doc(d))} for d in ids
    ]
    inp = spark.createDataFrame(rows, INPUT_SCHEMA)
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in extract(inp).collect()
    }
    for d in ids:
        want, _m = extract_grid_doc(generate_doc(d))
        assert got[d] == want, d


def test_merge_based_multirow_header_compound_names():
    """DH2 (xlsx_extractor.py:377-430): a horizontal merge in the top
    rows anchors a multi-row header; the block extends through the
    following all-string row, stopping at the first numeric row. The
    block is consumed as compound " / " column names
    (xlsx_extractor.py:434-476)."""
    spans, _m = extract_grid_doc(
        [
            ("grid_merge", "0,1,0,2", "", 1),
            g(0, 0, "Region"), g(0, 1, "Sales H1"),
            g(1, 1, "Jan"), g(1, 2, "Feb"),
            g(2, 0, "North"), g(2, 1, "10"), g(2, 2, "20"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "Region"),
        ("heading", "Sales H1 / Jan"), ("heading", "Sales H1 / Feb"),
        ("cell", "North"), ("cell", "10"), ("cell", "20"),
    ]


def test_title_row_above_multirow_header():
    """XH2 (xlsx_extractor.py:478-496): exactly one originally-filled
    cell atop a multi-row header block is a title heading, excluded
    from the compound column names."""
    spans, _m = extract_grid_doc(
        [
            ("grid_merge", "0,0,0,2", "", 0),
            g(0, 0, "Quarterly Report"),
            ("grid_merge", "1,1,1,2", "", 1_001),
            g(1, 0, "Region"), g(1, 1, "Sales"),
            g(2, 1, "Jan"), g(2, 2, "Feb"),
            g(3, 0, "North"), g(3, 1, "10"), g(3, 2, "20"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "Quarterly Report"),
        ("heading", "Region"),
        ("heading", "Sales / Jan"), ("heading", "Sales / Feb"),
        ("cell", "North"), ("cell", "10"), ("cell", "20"),
    ]


def test_vertical_merge_does_not_anchor_header():
    """Vertical-only merges are row-label grouping, not headers — the
    fallback first-non-numeric-row rule applies."""
    spans, _m = extract_grid_doc(
        [
            ("grid_merge", "1,0,2,0", "", 1_000),
            g(0, 0, "K"), g(0, 1, "V"),
            g(1, 0, "a"), g(1, 1, "1"),
            g(2, 1, "2"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "K"), ("heading", "V"),
        ("cell", "a"), ("cell", "1"),
        ("cell", "a"), ("cell", "2"),
    ]


def test_merge_header_stops_at_numeric_row():
    """Extension past the merge row halts at the first row containing a
    numeric cell: only the merge row itself is the header."""
    spans, _m = extract_grid_doc(
        [
            ("grid_merge", "0,0,0,1", "", 0),
            g(0, 0, "Totals by month"),
            g(1, 0, "Jan"), g(1, 1, "5"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "Totals by month"), ("heading", "Totals by month"),
        ("cell", "Jan"), ("cell", "5"),
    ]


def test_xh1_two_tables_split_by_blank_rows():
    """XH1 (xlsx_extractor.py:593-649): >=2 blank rows split a sheet
    into regions, each with its own header detection."""
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "Port"), g(0, 1, "Tonnage"),
            g(1, 0, "Albany"), g(1, 1, "10"),
            # rows 2-3 blank
            g(4, 0, "Vessel"), g(4, 1, "Grade"),
            g(5, 0, "Maria"), g(5, 1, "A"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "Port"), ("heading", "Tonnage"),
        ("cell", "Albany"), ("cell", "10"),
        ("heading", "Vessel"), ("heading", "Grade"),
        ("cell", "Maria"), ("cell", "A"),
    ]


def test_xh1_side_by_side_tables_split_by_blank_cols():
    """XH1 horizontal split: >=2 blank columns separate side-by-side
    tables within one vertical band."""
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "Port"), g(0, 1, "Tonnage"),
            g(1, 0, "Albany"), g(1, 1, "10"),
            # cols 2-3 blank
            g(0, 4, "Vessel"), g(0, 5, "Grade"),
            g(1, 4, "Maria"), g(1, 5, "A"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "Port"), ("heading", "Tonnage"),
        ("cell", "Albany"), ("cell", "10"),
        ("heading", "Vessel"), ("heading", "Grade"),
        ("cell", "Maria"), ("cell", "A"),
    ]


def test_xh1_small_fragment_dropped():
    """A lone far-away cell is not a table (min 2x2): it drops with a
    region_too_small metric while the real table extracts."""
    spans, m = extract_grid_doc(
        [
            g(0, 0, "Port"), g(0, 1, "Tonnage"),
            g(1, 0, "Albany"), g(1, 1, "10"),
            g(9, 9, "stray"),
        ]
    )
    assert kinds_texts(spans) == [
        ("heading", "Port"), ("heading", "Tonnage"),
        ("cell", "Albany"), ("cell", "10"),
    ]
    assert m["drop_reasons"]["region_too_small"] == 1


def test_xh5_annotation_block_above_table():
    """XH5 (xlsx_extractor.py:707-787): sparse annotation rows above a
    blank separator emit as text lines, not header or data cells."""
    hdr = ["Port", "Tonnage", "Grade", "ETA", "Cargo"]
    d1 = ["Albany", "10", "A", "12", "oil"]
    d2 = ["Sydney", "20", "B", "13", "ore"]
    spans, _m = extract_grid_doc(
        [g(0, 0, "Q3 Workbook"), g(1, 0, "Author:"), g(1, 1, "J. Doe")]
        # row 2 blank (gap of 1 keeps one region)
        + [g(3, c, v) for c, v in enumerate(hdr)]
        + [g(4, c, v) for c, v in enumerate(d1)]
        + [g(5, c, v) for c, v in enumerate(d2)]
    )
    assert kinds_texts(spans) == (
        [("text", "Q3 Workbook"), ("text", "Author:; J. Doe")]
        + [("heading", v) for v in hdr]
        + [("cell", v) for v in d1]
        + [("cell", v) for v in d2]
    )


def test_xh6_notes_column_behind_blank_fence():
    """XH6 phase 1 (xlsx_extractor.py:790-850): a blank fence column
    with a small notes section beyond it trims both."""
    rows = [
        ["Port", "Tonnage", "ETA", "Cargo", "", "Notes"],
        ["Albany", "10", "12", "oil", "", "check"],
        ["Sydney", "20", "13", "ore", "", ""],
    ]
    spans, _m = extract_grid_doc(
        [
            g(r, c, v)
            for r, row in enumerate(rows)
            for c, v in enumerate(row)
        ]
    )
    texts = [t for _k, t in kinds_texts(spans)]
    assert "Notes" not in texts and "check" not in texts
    assert kinds_texts(spans)[:4] == [
        ("heading", "Port"), ("heading", "Tonnage"),
        ("heading", "ETA"), ("heading", "Cargo"),
    ]


def test_xh6_headerless_sparse_edge_column():
    """XH6 phase 2: a directly-adjacent edge column with no header and
    sparse data trims inward."""
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "Port"), g(0, 1, "Tonnage"),
            g(1, 0, "Albany"), g(1, 1, "10"),
            g(2, 0, "Sydney"), g(2, 1, "20"),
            g(3, 0, "Hobart"), g(3, 1, "30"),
            g(1, 2, "x"),  # headerless, 1/3 of data rows filled
        ]
    )
    texts = [t for _k, t in kinds_texts(spans)]
    assert "x" not in texts
    assert texts == ["Port", "Tonnage", "Albany", "10", "Sydney", "20",
                     "Hobart", "30"]


def test_xh4_format_hint_rules():
    """XH4 (xlsx_extractor.py:348-374): date indicators -> 'date'
    (time-only formats excluded), currency symbols -> 'currency',
    '%' -> 'percentage', General/empty -> None; date outranks
    currency outranks percentage when a format mixes them."""
    from pdf_ocr_spark.kernels.gridk import format_hint

    assert format_hint("yyyy-mm-dd") == "date"
    assert format_hint("DD/MM/YYYY") == "date"
    assert format_hint("mmm yy") == "date"
    assert format_hint("hh:mm") is None          # time-only: no y/d
    assert format_hint("$#,##0.00") == "currency"
    assert format_hint("€ 0.00") == "currency"
    assert format_hint("0.0%") == "percentage"
    assert format_hint("General") is None
    assert format_hint("") is None
    assert format_hint(None) is None
    assert format_hint("yyyy $0.00") == "date"   # date wins


def test_xh4_date_serial_renders_iso_and_money_hints_are_value_neutral():
    """A whole-day Excel serial under a date hint renders as its ISO
    date (openpyxl value semantics); currency/percentage hints never
    change the value; an unhinted serial stays a number."""
    spans, _m = extract_grid_doc(
        [
            g(0, 0, "Port"), g(0, 1, "Date"), g(0, 2, "Price"),
            g(1, 0, "Albany"), g(1, 1, "45000", ref="fmt:yyyy-mm-dd"),
            g(1, 2, "1,234", ref="fmt:$#,##0.00"),
            g(2, 0, "Hobart"), g(2, 1, "45001"), g(2, 2, "0.5", ref="fmt:0.0%"),
        ]
    )
    texts = [t for _k, t in kinds_texts(spans)]
    # 45000 days past 1899-12-30 = 2023-03-15
    assert texts == ["Port", "Date", "Price",
                     "Albany", "2023-03-15", "1,234",
                     "Hobart", "45001", "0.5"]
