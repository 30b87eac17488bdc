"""Flow (DOCX-family) kernel: DH2 merge-based headers, DH3 titles,
DH4 boundary-aware compound fill, trailing-column strip, flow order."""

from __future__ import annotations

from pdf_ocr_spark.kernels.flowk import extract_flow_doc
from pdf_ocr_spark.kernels.gridk import _compound_headers


def B(b, row=0, col=0):
    return b * 1_000_000 + row * 1_000 + col


def _table(b, rows, merges=()):
    spans = []
    for ri, row in enumerate(rows):
        for ci, v in enumerate(row):
            if v:
                spans.append(("cell", v, "", B(b, ri, ci)))
    for m in merges:
        spans.append(("merge", m, "", B(b)))
    return spans


def test_flow_reference_worked_example():
    """The DOCX_EXTRACTOR.md worked shape: title row over a merged
    metric tier over a year tier, vMerge'd index column."""
    spans = [
        ("para", "Overview paragraph.", "", B(0)),
        ("para", "WHEAT", "st:h", B(1)),
    ]
    spans += _table(
        2,
        [
            ["Grains summary", "", "", "", ""],
            ["Region", "Area harvested", "", "Yield", ""],
            ["", "2025", "2024", "2025", "2024"],
            ["North", "1,200", "1,100", "3.5", "3.4"],
            ["South", "2,300", "2,200", "4.1", "4.0"],
        ],
        merges=["0,0,0,4", "1,0,2,0", "1,1,1,2", "1,3,1,4"],
    )
    out, m = extract_flow_doc(spans)
    assert [(k, t) for k, t, _r in [(k, t, r) for k, t, r, _o in out]][:8] == [
        ("text", "Overview paragraph."),
        ("section", "WHEAT"),
        ("heading", "Grains summary"),
        ("heading", "Region"),
        ("heading", "Area harvested / 2025"),
        ("heading", "Area harvested / 2024"),
        ("heading", "Yield / 2025"),
        ("heading", "Yield / 2024"),
    ]
    assert [t for k, t, _r, _o in out if k == "cell"] == [
        "North", "1,200", "1,100", "3.5", "3.4",
        "South", "2,300", "2,200", "4.1", "4.0",
    ]


def test_flow_para_title_fallback_and_in_grid_priority():
    # no in-grid title: the short heading paragraph becomes the table
    # title (heading), not a section
    spans = [("para", "EXPORTS", "st:h", B(0))]
    spans += _table(
        1,
        [
            ["Port", "Metric", ""],
            ["", "2025", "2024"],
            ["Albany", "1,000", "900"],
            ["Kwinana", "2,000", "1,800"],
        ],
        merges=["0,1,0,2", "0,0,1,0"],
    )
    out, _ = extract_flow_doc(spans)
    assert out[0][:2] == ("heading", "EXPORTS")
    assert all(k != "section" for k, *_ in out)

    # with an in-grid title, the paragraph stays a section label
    spans2 = [("para", "EXPORTS", "st:h", B(0))]
    spans2 += _table(
        1,
        [
            ["Shipments", "", ""],
            ["Port", "Metric", ""],
            ["", "2025", "2024"],
            ["Albany", "1,000", "900"],
            ["Kwinana", "2,000", "1,800"],
        ],
        merges=["0,0,0,2", "1,1,1,2", "1,0,2,0"],
    )
    out2, _ = extract_flow_doc(spans2)
    assert out2[0][:2] == ("section", "EXPORTS")
    assert out2[1][:2] == ("heading", "Shipments")


def test_flow_dh4_boundary_fill():
    """A filled index label followed by empty header cells over numeric
    columns must NOT bleed into those columns' compound names."""
    hdr = [["Port", "", "", "Group", "Group"],
           ["", "2020", "2021", "2020", "2021"]]
    data = [["Albany", "1,0", "2,0", "3,0", "4,0"]]
    assert _compound_headers(hdr, data_rows=data) == [
        "Port", "2020", "2021", "Group / 2020", "Group / 2021"
    ]
    # negative control: plain fill (no data classification) bleeds
    assert _compound_headers(hdr)[1] == "Port / 2020"


def test_flow_trailing_empty_column_strip():
    # DOCX grids have explicit width: trailing slots (shipped as
    # empty-text cells) whose fill is DH4-blocked (source is the text
    # index column) end with empty header names and no data -> both
    # strip (compress_docx_table). Note a NUMERIC-sourced fill bleeds
    # into trailing columns faithfully to the reference and prevents
    # the strip — only source-less / boundary-blocked columns drop.
    spans = _table(
        0,
        [
            ["Port", "", ""],
            ["Albany", "", ""],
            ["Kwinana", "", ""],
        ],
    )
    spans += [("cell", "", "", B(0, 0, 1)), ("cell", "", "", B(0, 0, 2))]
    out, m = extract_flow_doc(spans)
    assert [(k, t) for k, t, _r, _o in out] == [
        ("heading", "Port"), ("cell", "Albany"), ("cell", "Kwinana")
    ]
    assert m["drop_reasons"].get("empty_col") == 2


def test_flow_body_vmerge_past_scan_window_is_not_a_header():
    """DH2 only inspects the first 10 rows (docx_extractor.py:344
    ``table.rows[:max_scan]``): a vMerge'd row label deep in the data
    body (rows 15-17 here) must contribute nothing to the header
    count — the first data rows must NOT be consumed as headings."""
    rows = [["Port", "Tonnes"]]
    rows += [[f"P{r:02d}", str(100 + r)] for r in range(1, 20)]
    rows[15][0] = "Merged"   # rows 15-17 vMerge in column 0
    rows[16][0] = ""
    rows[17][0] = ""
    spans = _table(0, rows, merges=["15,0,17,0"])
    out, _ = extract_flow_doc(spans)
    kinds = [(k, t) for k, t, _r, _o in out]
    assert kinds[:3] == [
        ("heading", "Port"), ("heading", "Tonnes"), ("cell", "P01"),
    ]
    # exactly one header row: 2 headings, everything else cells
    assert sum(1 for k, _t in kinds if k == "heading") == 2


def test_flow_media_and_order_invariance():
    spans = [
        ("para", "Text one.", "", B(0)),
        ("media", "", "img://a", B(1)),
        ("para", "Text two.", "", B(2)),
    ]
    out, _ = extract_flow_doc(spans)
    assert [(k, t, r) for k, t, r, _o in out] == [
        ("text", "Text one.", ""),
        ("media", "", "img://a"),
        ("text", "Text two.", ""),
    ]
    # input span order never matters (offsets are authoritative)
    out2, _ = extract_flow_doc(list(reversed(spans)))
    assert out2 == out
