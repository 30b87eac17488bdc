"""Composed metadata-field retrieval: quick_scan precedence semantics
(docpact retrieval.py:269-334) and the required-field gate (340-366)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_spark.operators.retrieval import missing_required, quick_scan


def _zt(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, page int, zone string, zone_text string"
    )


def _scan(spark, rows, fields):
    out = quick_scan(_zt(spark, rows), fields)
    return {
        (r["doc_id"], r["field"]): (
            r["value"], r["source_zone"], r["confidence"], r["pattern"]
        )
        for r in out.collect()
    }


AS_OF = r"[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})"


def test_zone_order_beats_page_order(spark):
    """Zones are searched in field order across ALL pages before the
    next zone: a later-page match in zone 1 beats a page-0 match in
    zone 2 (retrieval.py:276-286 loop nesting)."""
    fields = [{"name": "as_of", "zones": ["title_page", "page_header"],
               "patterns": [AS_OF]}]
    rows = [
        ("d1", 0, "page_header", "As of May 2, 2021"),
        ("d1", 2, "title_page", "As of June 3, 2022"),
    ]
    got = _scan(spark, rows, fields)
    assert got[("d1", "as_of")] == ("June 3, 2022", "title_page", 0.9, AS_OF)


def test_page_order_beats_pattern_kind(spark):
    """Within one zone pages are scanned in order, and a category match
    on an earlier page wins over a custom match on a later page — but
    on the SAME page custom patterns come first (retrieval.py:288-320)."""
    fields = [{"name": "period", "zones": ["page_header"],
               "patterns": [AS_OF], "category": "temporal"}]
    rows = [
        ("d1", 0, "page_header", "Q2 FY24 outlook"),
        ("d1", 1, "page_header", "As of May 2, 2021"),
        ("d2", 0, "page_header", "Q2 FY24 As of May 2, 2021"),
    ]
    got = _scan(spark, rows, fields)
    assert got[("d1", "period")] == ("Q2 FY24", "page_header", 0.7, "quarter")
    assert got[("d2", "period")] == (
        "May 2, 2021", "page_header", 0.9, AS_OF
    )


def test_pages_beyond_scan_window_ignored(spark):
    """Only the first MAX_SCAN_PAGES pages are scanned
    (retrieval.py:254 'default: first 3 pages')."""
    fields = [{"name": "as_of", "zones": ["page_header"], "patterns": [AS_OF],
               "fallback": "flag"}]
    rows = [("d1", 3, "page_header", "As of May 2, 2021")]
    got = _scan(spark, rows, fields)
    assert got[("d1", "as_of")] == (None, "page_header", 0.0, None)


def test_fallback_default_and_flag(spark):
    fields = [
        {"name": "as_of", "zones": ["title_page"], "patterns": [AS_OF],
         "fallback": "default", "default": "January 1, 2020"},
        {"name": "doc_currency", "zones": ["page_footer"],
         "patterns": [r"\b(USD|EUR)\b"], "fallback": "flag",
         "required": True},
    ]
    rows = [("d1", 0, "title_page", "no date here")]
    got = _scan(spark, rows, fields)
    assert got[("d1", "as_of")] == (
        "January 1, 2020", "title_page", 0.5, None
    )
    assert got[("d1", "doc_currency")] == (None, "page_footer", 0.0, None)


def test_missing_required_gate(spark):
    fields = [
        {"name": "as_of", "zones": ["title_page"], "patterns": [AS_OF],
         "fallback": "default", "default": "January 1, 2020",
         "required": True},
        {"name": "doc_currency", "zones": ["page_footer"],
         "patterns": [r"\b(USD|EUR)\b"], "fallback": "flag",
         "required": True},
        {"name": "unit", "zones": ["anywhere"],
         "category": "table_context"},
    ]
    rows = [
        ("d1", 0, "title_page", "words only"),
        ("d2", 0, "page_footer", "settles USD"),
    ]
    scan = quick_scan(_zt(spark, rows), fields)
    got = {
        r["doc_id"]: (list(r["missing"]), r["passed"])
        for r in missing_required(scan, fields).collect()
    }
    # the fallback DEFAULT satisfies the gate (apply_fallbacks feeds the
    # final dict); flagged doc_currency does not; 'unit' is not required
    assert got == {
        "d1": (["doc_currency"], False),
        "d2": ([], True),
    }
