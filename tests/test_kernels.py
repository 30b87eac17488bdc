"""Pure-kernel unit tests (no Spark) — mirrors the reference's
inline-fixture unit-test style (docpact tests/test_deterministic.py,
tests/test_normalize.py, tests/test_serialize_coerce.py)."""

from __future__ import annotations

from pdf_ocr_spark.kernels.htmlk import expand_grid, extract_html
from pdf_ocr_spark.kernels.mixed import extract_mixed, extract_mixed_text
from pdf_ocr_spark.kernels.normalize import (
    coerce_value,
    detect_cell_type,
    normalize_text,
)
from pdf_ocr_spark.kernels.pdfish import extract_pdfish


def P(page, y, x):
    return page * 1_000_000 + y * 1_000 + x


# ------------------------------------------------------------ normalize


def test_normalize_cases():
    assert normalize_text("a b") == "a b"
    assert normalize_text("‘q’ “w”") == "'q' \"w\""
    assert normalize_text("a – b — c") == "a - b - c"
    assert normalize_text("z​w﻿") == "zw"
    assert normalize_text("a   b    c") == "a b c"
    assert normalize_text("  x  ") == "x"
    # idempotent
    s = "a  “b” — c​"
    assert normalize_text(normalize_text(s)) == normalize_text(s)


def test_coerce_cases():
    assert coerce_value("1,234") == "1234"
    assert coerce_value("55826,3") == "55826.3"
    assert coerce_value("(123)") == "-123"
    assert coerce_value("12.5%") == "12.5"
    assert coerce_value("$4,500") == "4500"
    assert coerce_value("1 234") == "1234"
    assert coerce_value("yes") == "true"
    assert coerce_value("No") == "false"
    assert coerce_value("+42") == "42"
    assert coerce_value("hello world") == "hello world"
    assert coerce_value("1.234.567") == "1.234.567"  # ambiguous -> unchanged


def test_detect_cell_type():
    assert detect_cell_type("2024-01-31") == "DATE"
    assert detect_cell_type("31/01/2024") == "DATE"
    assert detect_cell_type("15-Mar-24") == "DATE"
    assert detect_cell_type("1,234.5") == "NUMBER"
    assert detect_cell_type("(123)") == "NUMBER"
    assert detect_cell_type("wheat") == "STRING"


# --------------------------------------------------------------- pdfish


def test_pdfish_flat_table_reading_order():
    spans = [
        ("pdf_text", "Intro line", "", P(0, 50, 10)),
        # header row (y=150)
        ("pdf_text", "Port", "", P(0, 150, 10)),
        ("pdf_text", "Tonnage", "", P(0, 150, 200)),
        # data rows with y jitter <= 3
        ("pdf_text", "Albany", "", P(0, 170, 10)),
        ("pdf_text", "1,234", "", P(0, 172, 200)),
        ("pdf_text", "Kwinana", "", P(0, 190, 10)),
        ("pdf_text", "2,500", "", P(0, 191, 200)),
        ("media", "", "img://x/1", P(0, 260, 100)),
        ("pdf_text", "* Note: footnote to drop", "", P(0, 300, 10)),
    ]
    out, m = extract_pdfish(spans)
    assert [(k, t, r) for k, t, r, _ in out] == [
        ("text", "Intro line", ""),
        ("heading", "Port", ""),
        ("heading", "Tonnage", ""),
        ("cell", "Albany", ""),
        ("cell", "1,234", ""),
        ("cell", "Kwinana", ""),
        ("cell", "2,500", ""),
        ("media", "", "img://x/1"),
    ]
    assert [o for _, _, _, o in out] == list(range(8))
    assert m["drop_reasons"] == {"footnote": 1}
    assert m["spans_in"] == 9 and m["spans_out"] == 8 and m["dropped"] == 1


def test_pdfish_section_and_aggregation():
    spans = [
        ("pdf_text", "GERALDTON", "", P(0, 50, 10)),
        ("pdf_text", "Vessel", "", P(0, 80, 10)),
        ("pdf_text", "Qty", "", P(0, 80, 200)),
        ("pdf_text", "ship", "", P(0, 100, 10)),
        ("pdf_text", "100", "", P(0, 100, 200)),
        ("pdf_text", "boat", "", P(0, 120, 10)),
        ("pdf_text", "200", "", P(0, 120, 200)),
        # single-span numeric aggregation row stays in the run as a cell
        ("pdf_text", "337,000", "", P(0, 140, 200)),
    ]
    out, _ = extract_pdfish(spans)
    kinds = [k for k, _, _, _ in out]
    assert kinds[0] == "section"
    assert out[0][1] == "GERALDTON"
    assert kinds[1:3] == ["heading", "heading"]
    assert kinds[3:] == ["cell"] * 5
    assert out[-1][1] == "337,000"


def test_pdfish_side_by_side_split():
    spans = []
    # left table x in {10, 60}; right table x in {600, 660}; 5 rows
    for i in range(5):
        y = 100 + 20 * i
        spans += [
            ("pdf_text", f"L{i}a", "", P(0, y, 10)),
            ("pdf_text", f"{i}00", "", P(0, y, 60)),
            ("pdf_text", f"R{i}a", "", P(0, y, 600)),
            ("pdf_text", f"{i}11", "", P(0, y, 660)),
        ]
    out, _ = extract_pdfish(spans)
    texts = [t for _, t, _, _ in out]
    # all left-block spans precede all right-block spans (XY-cut order)
    left_idx = [i for i, t in enumerate(texts) if t.startswith("L") or t.endswith("00")]
    right_idx = [i for i, t in enumerate(texts) if t.startswith("R") or t.endswith("11")]
    assert max(left_idx) < min(right_idx)


def test_pdfish_xy_cut_three_columns():
    spans = []
    # three tables side by side: x bands {10,60}, {600,660}, {1200,1260}
    for i in range(5):
        y = 100 + 20 * i
        for b, x0 in enumerate((10, 350, 700)):
            spans += [
                ("pdf_text", f"B{b}r{i}", "", P(0, y, x0)),
                ("pdf_text", f"{b}{i}0", "", P(0, y, x0 + 60)),
            ]
    out, _ = extract_pdfish(spans)
    texts = [t for _, t, _, _ in out]
    # recursive x-cut: every block-0 span precedes every block-1 span,
    # which precedes every block-2 span
    pos = {b: [i for i, t in enumerate(texts) if f"B{b}" in t or t.startswith(str(b))] for b in range(3)}
    assert max(pos[0]) < min(pos[1]) < max(pos[1]) < min(pos[2])


def test_pdfish_xy_cut_fullwidth_above_columns():
    # full-width intro rows, a large y-gap, then two side-by-side tables:
    # the y-cut isolates the intro band so the x-cut never splits it.
    spans = [
        ("pdf_text", "Intro paragraph line one", "", P(0, 50, 10)),
        ("pdf_text", "Intro paragraph line two", "", P(0, 70, 10)),
    ]
    for i in range(5):
        y = 400 + 20 * i
        spans += [
            ("pdf_text", f"L{i}", "", P(0, y, 10)),
            ("pdf_text", f"{i}00", "", P(0, y, 60)),
            ("pdf_text", f"R{i}", "", P(0, y, 600)),
            ("pdf_text", f"{i}11", "", P(0, y, 660)),
        ]
    out, _ = extract_pdfish(spans)
    texts = [t for _, t, _, _ in out]
    assert texts[0].startswith("Intro") and texts[1].startswith("Intro")
    left_idx = [i for i, t in enumerate(texts) if t.startswith("L") or t.endswith("00")]
    right_idx = [i for i, t in enumerate(texts) if t.startswith("R") or t.endswith("11")]
    assert max(left_idx) < min(right_idx)


def test_pdfish_multi_page_order_and_empty_drop():
    spans = [
        ("pdf_text", "page1 text", "", P(1, 50, 10)),
        ("pdf_text", "page0 text", "", P(0, 50, 10)),
        ("pdf_text", "   ", "", P(0, 80, 10)),
    ]
    out, m = extract_pdfish(spans)
    assert [t for _, t, _, _ in out] == ["page0 text", "page1 text"]
    assert m["drop_reasons"] == {"empty": 1}


def test_pdfish_preceding_header_scan():
    # a short label row aligned above the run joins the header block; a
    # long title row does not
    spans = [
        ("pdf_text", "Shipping Stem Report FY24", "", P(0, 60, 10)),  # title
        ("pdf_text", "(tonnes)", "", P(0, 80, 200)),  # aligned short label
        ("pdf_text", "Port", "", P(0, 100, 10)),
        ("pdf_text", "Qty", "", P(0, 100, 200)),
    ]
    for i in range(3):
        y = 120 + 20 * i
        spans += [
            ("pdf_text", f"port{i}", "", P(0, y, 10)),
            ("pdf_text", f"{i}00", "", P(0, y, 200)),
        ]
    out, _ = extract_pdfish(spans)
    kinds = {t: k for k, t, _r, _o in out}
    # the preceding label joins the header stack and compounds with the
    # in-run leaf header below it (compress.py:2534-2552)
    assert kinds["(tonnes) / Qty"] == "heading"
    assert kinds["Port"] == "heading"
    assert kinds["Shipping Stem Report FY24"] == "text"  # too long -> title


def test_pdfish_ocr_repair_on_cells():
    # number-shaped cell tokens get glyph-confusion repair (O->0, l->1,
    # S->5, B->8); word cells and headings pass through untouched
    spans = [
        ("pdf_text", "Port", "", P(0, 100, 10)),
        ("pdf_text", "Qty SO", "", P(0, 100, 200)),  # heading: untouched
        ("pdf_text", "Albany", "", P(0, 120, 10)),
        ("pdf_text", "1,2O4", "", P(0, 120, 200)),
        ("pdf_text", "Kwinana", "", P(0, 140, 10)),
        ("pdf_text", "BlS", "", P(0, 140, 200)),  # confusable-only token
    ]
    out, _ = extract_pdfish(spans)
    by_kind = {}
    for k, t, _r, _o in out:
        by_kind.setdefault(k, []).append(t)
    assert "Qty SO" in by_kind["heading"]
    assert "1,204" in by_kind["cell"]
    assert "815" in by_kind["cell"]
    assert "Albany" in by_kind["cell"]


def test_pdfish_stacked_header_rows():
    # two non-numeric leading rows with fewer spans than the 3-span data
    # signature -> BOTH become heading rows (H7 bottom-up estimation)
    spans = [
        ("pdf_text", "Shipments", "", P(0, 80, 10)),
        ("pdf_text", "2024", "", P(0, 80, 200)),
        ("pdf_text", "Port", "", P(0, 100, 10)),
        ("pdf_text", "Qty", "", P(0, 100, 200)),
    ]
    for i in range(4):
        y = 120 + 20 * i
        spans += [
            ("pdf_text", f"port{i}", "", P(0, y, 10)),
            ("pdf_text", f"{i}00", "", P(0, y, 200)),
            ("pdf_text", f"{i}.5", "", P(0, y, 300)),
        ]
    out, _ = extract_pdfish(spans)
    kinds_texts = [(k, t) for k, t, _, _ in out]
    headings = [t for k, t in kinds_texts if k == "heading"]
    # "2024" is numeric so that span keeps heading via its row; the row
    # membership is what H7 estimates -- both leading rows are headers,
    # and the 2-row stack emits compound " / " names per column
    assert headings == ["Shipments / Port", "2024 / Qty"]
    cells = [t for k, t in kinds_texts if k == "cell"]
    assert "port0" in cells and "3.5" in cells


def test_pdfish_kv_pairs_region():
    # run of 2-span non-aligned rows -> merged 'key: value' text spans;
    # an isolated 2-span row stays two separate text spans
    spans = [
        ("pdf_text", "Vessel", "", P(0, 100, 10)),
        ("pdf_text", "MV Ocean Star", "", P(0, 100, 300)),
        ("pdf_text", "Laycan", "", P(0, 120, 10)),
        ("pdf_text", "12-15 March", "", P(0, 122, 290)),
        ("pdf_text", "Port", "", P(0, 140, 12)),
        ("pdf_text", "Kwinana", "", P(0, 140, 310)),
    ]
    out, _ = extract_pdfish(spans)
    texts = [t for k, t, _, _ in out]
    # shared anchors would make this a table; x positions jitter (10/12,
    # 300/290/310) keeps anchors but the non-numeric cells make every row
    # header-like -> verify kv render only when NOT detected as table
    assert (
        "Vessel: MV Ocean Star" in texts
        or ("Vessel" in texts and "MV Ocean Star" in texts)
    )
    spans2 = [
        ("pdf_text", "Key A", "", P(0, 100, 10)),
        ("pdf_text", "val 1", "", P(0, 100, 500)),
        ("pdf_text", "Key B", "", P(0, 130, 40)),
        ("pdf_text", "val 2", "", P(0, 131, 700)),
    ]
    out2, _ = extract_pdfish(spans2)
    assert [t for k, t, _, _ in out2] == ["Key A: val 1", "Key B: val 2"]


def test_pdfish_zone_extraction():
    from pdf_ocr_spark.kernels.pdfish import extract_zones

    spans = [
        ("pdf_text", "Annual Report 2024", "", P(0, 50, 10)),   # header+title
        ("pdf_text", "Grain Shipments", "", P(0, 300, 10)),     # title zone
        ("pdf_text", "body row", "", P(0, 500, 10)),            # no zone
        ("pdf_text", "page 1 of 9", "", P(0, 900, 10)),         # footer
        ("pdf_text", "second page head", "", P(1, 100, 10)),    # header p1
        ("media", "", "img://x", P(0, 60, 500)),                # ignored
    ]
    z = extract_zones(spans)
    assert z["header"] == ["Annual Report 2024", "second page head"]
    assert z["footer"] == ["page 1 of 9"]
    assert z["title"] == ["Annual Report 2024", "Grain Shipments"]


def test_pdfish_fuzzy_page_filter():
    from pdf_ocr_spark.kernels.pdfish import filter_pages_by_titles

    spans = []
    for page, title in enumerate(
        ["Iron Ore Tonnage", "Wheat Exports", "Appendix"]
    ):
        spans.append(("pdf_text", title, "", P(page, 100, 10)))
        spans.append(("pdf_text", f"data {page}", "", P(page, 500, 10)))
    kept, out = filter_pages_by_titles(spans, ["iron ore tonnage"], 90.0)
    assert kept == [0]
    assert {s[3] // 1_000_000 for s in out} == {0}
    # fuzzy (not exact) match + explicit page union
    kept2, _ = filter_pages_by_titles(
        spans, ["weat exports"], 85.0, pages=[2]
    )
    assert kept2 == [1, 2]


# ----------------------------------------------------------------- html


def test_expand_grid_colspan_rowspan():
    rows = [
        [{"text": "A", "colspan": 2, "rowspan": 1}, {"text": "B", "colspan": 1, "rowspan": 1}],
        [{"text": "C", "colspan": 1, "rowspan": 2}, {"text": "D", "colspan": 1, "rowspan": 1},
         {"text": "E", "colspan": 1, "rowspan": 1}],
        [{"text": "F", "colspan": 1, "rowspan": 1}, {"text": "G", "colspan": 1, "rowspan": 1}],
    ]
    assert expand_grid(rows) == [
        ["A", "A", "B"],
        ["C", "D", "E"],
        ["C", "F", "G"],
    ]


def test_html_boilerplate_strip():
    html = (
        "<html><body>"
        "<nav><ul><li><a href='/'>Home</a></li><li><a href='/x'>X</a></li></ul></nav>"
        "<div class='cookie-banner'><p>We use cookies <a href='#'>OK</a></p></div>"
        "<main><h1>Title Here</h1>"
        "<p>This is the main article content with plenty of plain text in it.</p>"
        "<img src='img://d/0'>"
        "<table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr></table>"
        "</main>"
        "<footer><p>(c) corp <a href='/p'>Privacy</a></p></footer>"
        "</body></html>"
    )
    out, m = extract_html(html)
    assert [(k, t, r) for k, t, r, _ in out] == [
        ("heading", "Title Here", ""),
        ("text", "This is the main article content with plenty of plain text in it.", ""),
        ("media", "", "img://d/0"),
        ("cell", "H1", ""),
        ("cell", "H2", ""),
        ("cell", "a", ""),
        ("cell", "b", ""),
    ]
    assert m["drop_reasons"]["boilerplate"] >= 3  # nav li*2 collapse + cookie + footer


def test_html_tokenizer_matches_stdlib():
    """Differential: the regex tokenizer must deliver the exact same
    block stream as stdlib HTMLParser(convert_charrefs=True) driving the
    same handlers — over the whole generated html corpus family plus
    hand-picked tokenizer edge cases."""
    from html.parser import HTMLParser

    from pdf_ocr_spark.corpus import generate_doc
    from pdf_ocr_spark.kernels.htmlk import _BlockHandlers, _Parser

    class Stdlib(_BlockHandlers, HTMLParser):
        def __init__(self):
            _BlockHandlers.__init__(self)
            HTMLParser.__init__(self, convert_charrefs=True)

        def handle_starttag(self, tag, attrs):
            _BlockHandlers.handle_starttag(self, tag, dict(attrs))

    cases = [
        generate_doc(f"html-{i:06d}")[0][1] for i in range(200)
    ] + [
        # comments split data runs; entities decode; CRLF whitespace
        "<main><p>a &amp; b<!-- note -->c &#65;&lt;tag&gt;</p>\r\n<p>d</p></main>",
        # script raw content containing tags and & (no decode, no blocks)
        "<main><script>if (a<b && c>d) { x='<p>no</p>'; }</script><p>kept text here, long enough to stay.</p></main>",
        "<main><style>p>a{color:#fff}</style><p>styled body paragraph with enough plain text.</p></main>",
        # unterminated script at EOF: tail dropped, no crash
        "<main><p>before script tail is fine and long.</p><script>var x = '<p>",
        # self-closing, void, valueless + single-quoted + unquoted attrs
        "<main><p>one long enough real paragraph of content here.</p><br/><img src='img://a/1' alt=fig><input disabled></main>",
        # uppercase names, colspan/rowspan quoting variants
        "<MAIN><TABLE><TR><TH COLSPAN=2>H</TH><TH>T</TH></TR><TR><TD ROWSPAN='2'>x</TD><TD>y</TD><TD>z</TD></TR><TR><TD>p</TD><TD>q</TD></TR></TABLE></MAIN>",
        # stray '<' as data; doctype; processing instruction
        "<!DOCTYPE html><?xml foo?><main><p>3 < 5 is true and this sentence is long.</p></main>",
        # boilerplate class via entity-bearing attr value
        '<main><div class="ad-&quot;zone&quot;"><p>drop me</p></div><p>surviving content paragraph, nice and long.</p></main>',
        # nested anchors / link density bookkeeping across chunks
        "<main><p><a href='/a'>one</a> mid <a href='/b'>two</a> tail words enough to keep density low for this block.</p></main>",
        # table cell with entity and a comment inside
        "<main><table><tr><td>a&nbsp;b<!--x-->c</td><td>&euro;9</td></tr></table></main>",
    ]
    for html in cases:
        fast = _Parser()
        fast.feed(html)
        fast._flush_cur()
        ref = Stdlib()
        ref.feed(html)
        ref.close()
        ref._flush_cur()
        assert fast.blocks == ref.blocks, html[:120]


def test_html_link_density():
    html = (
        "<html><body><main>"
        "<p><a href='/a'>one</a> <a href='/b'>two</a> <a href='/c'>three</a> x</p>"
        "<p>A genuinely long paragraph of real content without any links at all, "
        "definitely dense enough.</p>"
        "</main></body></html>"
    )
    out, m = extract_html(html)
    assert len(out) == 1 and out[0][0] == "text"
    assert m["drop_reasons"]["boilerplate"] == 1


# ---------------------------------------------------------------- mixed


def test_mixed_validation_and_coercion():
    spans = [
        ("text", "title: Weekly report", "", 0),
        ("text", "amount: 1,234", "", 1),
        ("text", "grade: A1", "", 2),
        ("text", "grade: ZZ", "", 3),  # invalid -> dropped
        ("media", "", "img://m/4", 4),
        ("text", "  ", "", 5),  # empty -> dropped
        ("text", "(500)", "", 6),
    ]
    out, m = extract_mixed(spans)
    assert [(k, t, r) for k, t, r, _ in out] == [
        ("text", "title: Weekly report", ""),
        ("text", "amount: 1234", ""),
        ("text", "grade: A1", ""),
        ("media", "", "img://m/4"),
        ("text", "-500", ""),
    ]
    assert m["drop_reasons"] == {"invalid_value": 1, "empty": 1}
    assert [o for _, _, _, o in out] == list(range(5))


def test_mixed_missing_required_field():
    out, m = extract_mixed([("text", "no fields here", "", 0)])
    assert m["drop_reasons"].get("missing_required_field") == 1


def test_mixed_text_routing_equivalence():
    """Routing media around the text kernel + offset merge == full kernel."""
    spans = [
        ("text", "title: x", "", 0),
        ("media", "", "img://1", 1),
        ("text", "grade: ZZ", "", 2),
        ("text", "amount: 1,234", "", 3),
        ("media", "", "img://2", 4),
    ]
    full, _ = extract_mixed(spans)
    text_only = [s for s in spans if s[0] != "media"]
    media = [("media", "", s[2], s[3]) for s in spans if s[0] == "media"]
    routed, _ = extract_mixed_text(text_only)
    merged = sorted(routed + media, key=lambda s: s[3])
    merged = [(k, t, r, i) for i, (k, t, r, _o) in enumerate(merged)]
    assert merged == full


# ---------------------------------------------------------------- boxish


def test_boxish_slide_table_and_free_text():
    from pdf_ocr_spark.kernels.boxish import extract_boxish

    spans = [
        ("box", "Quarterly Review", "", P(0, 50, 10)),  # title text box
        # aligned 2x3 box cluster -> table
        ("box", "Port", "", P(0, 200, 100)),
        ("box", "Qty", "", P(0, 200, 300)),
        ("box", "Albany", "", P(0, 300, 100)),
        ("box", "1,2O4", "", P(0, 302, 300)),   # ocr repair applies
        ("box", "Kwinana", "", P(0, 400, 101)),
        ("box", "2,500", "", P(0, 400, 299)),
        ("media", "", "img://slide0/logo", P(0, 600, 500)),
        # slide 1: free text only
        ("box", "Thank you", "", P(1, 300, 200)),
    ]
    out, m = extract_boxish(spans)
    seq = [(k, t, r) for k, t, r, _ in out]
    assert ("text", "Quarterly Review", "") in seq
    assert ("heading", "Port", "") in seq and ("heading", "Qty", "") in seq
    assert ("cell", "1,204", "") in seq  # glyph repair in table cells
    assert ("media", "", "img://slide0/logo") in seq
    assert seq[-1] == ("text", "Thank you", "")  # slide order preserved
    assert [o for _, _, _, o in out] == list(range(len(out)))


def test_boxish_order_invariance():
    import random

    from pdf_ocr_spark.kernels.boxish import extract_boxish

    spans = [
        ("box", f"r{i}c{j}", "", P(0, 100 + 80 * i, 100 + 150 * j))
        for i in range(4)
        for j in range(3)
    ]
    base, _ = extract_boxish(list(spans))
    rng = random.Random(7)
    for _ in range(5):
        shuffled = list(spans)
        rng.shuffle(shuffled)
        out, _ = extract_boxish(shuffled)
        assert out == base


# ------------------------------------------------- style channel (FH/VH)


def test_pdfish_bold_header_prefix():
    """FH2: two bold all-word header rows over all-word data rows — the
    span-count signature is uniform and every row is numeric-free, so
    structure alone would mark only row 0; the bold channel marks both."""
    spans = []
    for yi, ref in ((150, "st:b"), (170, "st:b"), (190, ""), (210, ""),
                    (230, "")):
        for ci, x in enumerate((10, 200, 400)):
            spans.append(("pdf_text", f"w{yi}{ci}", ref, P(0, yi, x)))
    out, _ = extract_pdfish(spans)
    kinds = [k for k, _, _, _ in out]
    # the 2-row bold stack emits compound " / " names, one per column
    assert kinds == ["heading"] * 3 + ["cell"] * 9
    assert [t for k, t, _, _ in out if k == "heading"] == [
        "w1500 / w1700", "w1501 / w1701", "w1502 / w1702"
    ]
    # style flags never leak into output media_refs
    assert all(r == "" for _, _, r, _ in out)


def test_pdfish_bold_needs_data_contrast():
    """FH2 gate: all rows bold -> no bold-header evidence (no contrast);
    falls back to the structural first-row rule."""
    spans = []
    for yi in (150, 170, 190, 210, 230):
        for x in (10, 200, 400):
            spans.append(("pdf_text", f"w{yi}{x}", "st:b", P(0, yi, x)))
    out, _ = extract_pdfish(spans)
    kinds = [k for k, _, _, _ in out]
    assert kinds == ["heading"] * 3 + ["cell"] * 12


def test_pdfish_zebra_rescue():
    """VH3: >= 4 fill alternations between exactly 2 colors rescue a
    single-span (structurally prose) list as table cells."""
    spans = [
        ("pdf_text", f"line {k}", f"st:#{k % 2}", P(0, 150 + 20 * k, 10))
        for k in range(8)
    ]
    out, _ = extract_pdfish(spans)
    assert [k for k, _, _, _ in out] == ["cell"] * 8
    # below the alternation threshold the rows stay text
    out2, _ = extract_pdfish(spans[:4])
    assert [k for k, _, _, _ in out2] == ["text"] * 4
    # one color only (no alternation) stays text
    spans3 = [
        ("pdf_text", f"line {k}", "st:#0", P(0, 150 + 20 * k, 10))
        for k in range(8)
    ]
    out3, _ = extract_pdfish(spans3)
    assert [k for k, _, _, _ in out3] == ["text"] * 8


def test_pdfish_italic_caption_demoted():
    """FH3: an in-run row that is >80% italic is secondary content —
    emitted as text, not cells."""
    spans = [
        ("pdf_text", "Port", "", P(0, 150, 10)),
        ("pdf_text", "Tonnage", "", P(0, 150, 200)),
        ("pdf_text", "Albany", "", P(0, 170, 10)),
        ("pdf_text", "1,234", "", P(0, 172, 200)),
        ("pdf_text", "Kwinana", "", P(0, 190, 10)),
        ("pdf_text", "2,500", "", P(0, 191, 200)),
        # caption row: shares both anchors, all italic
        ("pdf_text", "figures", "st:i", P(0, 210, 10)),
        ("pdf_text", "provisional", "st:i", P(0, 210, 200)),
    ]
    out, _ = extract_pdfish(spans)
    assert [(k, t) for k, t, _, _ in out] == [
        ("heading", "Port"), ("heading", "Tonnage"),
        ("cell", "Albany"), ("cell", "1,234"),
        ("cell", "Kwinana"), ("cell", "2,500"),
        ("text", "figures"), ("text", "provisional"),
    ]


def test_styled_corpus_matches_generator_truth():
    """Every styled corpus doc extracts to exactly the generator's
    ground-truth per-kind counts (the x09 oracle, kernel-independent)."""
    from collections import Counter

    from pdf_ocr_spark.corpus import styled_doc

    for i in range(30):
        spans, truth = styled_doc(i)
        out, _ = extract_pdfish(spans)
        got = Counter(k for k, _, _, _ in out)
        assert {k: v for k, v in got.items() if v} == {
            k: v for k, v in truth.items() if v
        }, f"styled doc {i}"


def test_twin_pairs_extract_equal():
    """Every twin-pair family extracts both sides to the SAME span
    sequence (the x07_twin_extract_suite invariant, kernel level):
    transposed vs flat, multi-row vs pre-merged, width-merged vs
    unmerged."""
    from pdf_ocr_spark.corpus import merged_pair, multirow_pair, transposed_pair

    for fam, pair_fn in (
        ("transposed", transposed_pair),
        ("multirow", multirow_pair),
        ("width", merged_pair),
    ):
        for i in range(24):
            a, b = pair_fn(i)
            assert extract_pdfish(a)[0] == extract_pdfish(b)[0], (fam, i)


def test_width_split_requires_width_channel():
    """Negative control: with the width tokens stripped, the merged-span
    doc must NOT split (positions-only corpora are untouched by
    compress.py:948-1032 semantics — the operator is undefined without
    a glyph-width signal)."""
    from pdf_ocr_spark.corpus import merged_pair

    for i in range(8):
        m, u = merged_pair(i)
        m_nw = [(k, t, "", o) for k, t, _r, o in m]
        u_nw = [(k, t, "", o) for k, t, _r, o in u]
        assert extract_pdfish(m_nw)[0] != extract_pdfish(u_nw)[0], i


def test_split_merged_spans_semantics():
    """Direct split-operator checks (compress.py:948-1032): word-boundary
    only, min_gap guard, boundary must be owned by a different row."""
    from pdf_ocr_spark.kernels.pdfish import _split_merged_spans

    # row 0 owns x=70; row 1 has one merged span 10..130 crossing it
    rows = [
        [(150, 10, "pdf_text", "Head1", "st:@50"),
         (150, 70, "pdf_text", "Head2", "st:@50")],
        [(170, 10, "pdf_text", "12:34 abc", "st:@90")],
    ]
    out = _split_merged_spans(rows)
    assert [(s[1], s[3]) for s in out[1]] == [(10, "12:34"), (70, "abc")]
    # no split mid-word: boundary char index lands inside 'abcdef'
    rows_mid = [
        [(150, 10, "pdf_text", "Head1", "st:@50"),
         (150, 70, "pdf_text", "Head2", "st:@50")],
        [(170, 10, "pdf_text", "x abcdefgh", "st:@100")],
    ]
    # boundary at 70 -> char 6 -> inside 'abcdefgh' (no space at 5/6)
    out_mid = _split_merged_spans(rows_mid)
    assert [(s[1], s[3]) for s in out_mid[1]] == [(10, "x abcdefgh")]
    # boundary owned by the SAME row only: never splits
    rows_same = [
        [(170, 10, "pdf_text", "12:34 abc", "st:@90"),
         (170, 200, "pdf_text", "zz", "st:@20")],
    ]
    assert _split_merged_spans(rows_same) == [
        sorted(rows_same[0], key=lambda t: (t[1], t[3]))
    ]
    # each fragment gets its OWN width token (the merged span's full
    # width must not ride along: it would inflate the page median char
    # width and stretch stacked-header column bounds — downstream
    # consumers read span_width(s[4]) per fragment)
    from pdf_ocr_spark.kernels.pdfish import span_width

    frags = _split_merged_spans(rows)[1]
    assert [span_width(s[4]) for s in frags] == [
        round(len("12:34") * 10), round(len("abc") * 10)
    ]
    # flags/fill portions of the token survive the rewrite
    rows_flag = [
        [(150, 10, "pdf_text", "Head1", "st:@50"),
         (150, 70, "pdf_text", "Head2", "st:@50")],
        [(170, 10, "pdf_text", "12:34 abc", "st:b#f1@90")],
    ]
    f2 = _split_merged_spans(rows_flag)[1]
    assert [s[4] for s in f2] == ["st:b#f1@50", "st:b#f1@30"]


def test_vh1_grid_rescue():
    """VH1 (compress.py:123-165 + 2251-2256): a ruled grid (>=3
    significant h- and v-lines) rescues text-missed rows as cells;
    without the lines the same rows stay prose; insignificant lines
    (short extents) never form a grid."""
    from pdf_ocr_spark.corpus import styled_doc

    spans, truth = styled_doc(3)  # i%4==3 = VH1 archetype
    out, m = extract_pdfish(spans)
    assert sum(1 for k, *_ in out if k == "cell") == truth["cell"]
    assert m["drop_reasons"].get("ruling", 0) > 0
    nolines = [s for s in spans if s[0] != "pdf_line"]
    out2, _ = extract_pdfish(nolines)
    assert all(k != "cell" for k, *_ in out2)
    # short lines are insignificant: extent < 10% page width (h)
    short = [
        (k, t, "ln:h:10:50" if k == "pdf_line" else r, o)
        for k, t, r, o in spans
    ]
    out3, _ = extract_pdfish(short)
    assert all(k != "cell" for k, *_ in out3)


def test_vh2_fill_header_prefix():
    """VH2 (compress.py:169-226): a shared-fill header prefix over
    unfilled data rows extends the header estimate; stripping the fills
    collapses it to the structural single-row fallback."""
    from pdf_ocr_spark.corpus import styled_doc

    spans, truth = styled_doc(4)  # i%5==4 = VH2 archetype
    out, _ = extract_pdfish(spans)
    heads = [t for k, t, *_ in out if k == "heading"]
    assert len(heads) == truth["heading"]
    # the fill-extended 2-row stack produces compound " / " names
    assert all(" / " in t for t in heads)
    nofill = [(k, t, "", o) for k, t, _r, o in spans]
    out2, _ = extract_pdfish(nofill)
    heads2 = [t for k, t, *_ in out2 if k == "heading"]
    # without the fill contrast the structural fallback finds only the
    # single leaf row: plain names, and the second row demotes to cells
    assert all(" / " not in t for t in heads2)
    assert sum(1 for k, *_ in out2 if k == "cell") > truth["cell"]


def test_reheader_column_remap():
    """interpret.py:1185-1240 Phase A: a permuted section re-header is
    consumed AND its section's data cells re-emit in global-header
    order; a same-order re-header leaves emission untouched."""
    spans = [
        ("pdf_text", "Port", "", P(0, 100, 10)),
        ("pdf_text", "Vessel", "", P(0, 100, 200)),
        ("pdf_text", "Tonnage", "", P(0, 100, 400)),
        ("pdf_text", "Albany", "", P(0, 120, 10)),
        ("pdf_text", "aurora", "", P(0, 120, 200)),
        ("pdf_text", "1,000", "", P(0, 120, 400)),
        ("pdf_text", "Kwinana", "", P(0, 140, 10)),
        ("pdf_text", "borealis", "", P(0, 140, 200)),
        ("pdf_text", "2,000", "", P(0, 140, 400)),
        # permuted re-header
        ("pdf_text", "Tonnage", "", P(0, 160, 10)),
        ("pdf_text", "Port", "", P(0, 160, 200)),
        ("pdf_text", "Vessel", "", P(0, 160, 400)),
        ("pdf_text", "3,000", "", P(0, 180, 10)),
        ("pdf_text", "Esperance", "", P(0, 180, 200)),
        ("pdf_text", "corona", "", P(0, 180, 400)),
        ("pdf_text", "4,000", "", P(0, 200, 10)),
        ("pdf_text", "Bunbury", "", P(0, 200, 200)),
        ("pdf_text", "delta", "", P(0, 200, 400)),
    ]
    out, m = extract_pdfish(spans)
    assert m["drop_reasons"].get("reheader") == 3
    cells = [t for k, t, _r, _o in out if k == "cell"]
    assert cells == [
        "Albany", "aurora", "1,000",
        "Kwinana", "borealis", "2,000",
        "Esperance", "corona", "3,000",
        "Bunbury", "delta", "4,000",
    ]


def test_stacked_pair_bounds_overlap():
    """x12 twin family: the stacked doc equals its flat compound-name
    twin, and ONLY via the bounds-overlap channel — stripping the width
    tokens drops g2 to the nearest-anchor tie-break (wrong column) and
    breaks the equality (negative control)."""
    from pdf_ocr_spark.corpus import stacked_pair

    for i in range(12):
        a, b = stacked_pair(i)
        assert extract_pdfish(a)[0] == extract_pdfish(b)[0], i

    a, b = stacked_pair(0)
    no_width = [
        (k, t, "" if r.startswith("st:") else r, o) for k, t, r, o in a
    ]
    assert extract_pdfish(no_width)[0] != extract_pdfish(b)[0]


def test_boxish_slide_table_gates():
    """Slide-specific gates (pptx_extractor.py:352-380): a 2-row
    aligned cluster, or a sparse slide (<6 boxes), stays free text."""
    from pdf_ocr_spark.kernels.boxish import extract_boxish

    # 2 aligned rows x 3 cols on a 7-box slide: run too short
    spans = [
        ("box", "Intro", "", P(0, 50, 10)),
        ("box", "A", "", P(0, 200, 100)),
        ("box", "B", "", P(0, 200, 300)),
        ("box", "C", "", P(0, 200, 500)),
        ("box", "1", "", P(0, 300, 100)),
        ("box", "2", "", P(0, 300, 300)),
        ("box", "3", "", P(0, 300, 500)),
    ]
    out, _m = extract_boxish(spans)
    assert all(k == "text" for k, *_ in out)

    # 3 aligned rows but only 4 boxes on the slide: below 6-box minimum
    spans2 = [
        ("box", "A", "", P(0, 200, 100)), ("box", "B", "", P(0, 200, 300)),
        ("box", "1", "", P(0, 300, 100)),
        ("box", "2", "", P(0, 400, 300)),
    ]
    out2, _m2 = extract_boxish(spans2)
    assert all(k == "text" for k, *_ in out2)
