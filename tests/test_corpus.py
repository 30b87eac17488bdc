"""Corpus generator determinism (FIXTURES.md: pure function of
(doc_id, seed) — regenerable independently on any executor)."""

from __future__ import annotations

from pdf_ocr_spark.corpus import doc_ids, generate_doc
from pdf_ocr_spark.oracle import oracle


def test_generator_deterministic():
    for d in ["pdfish-000007", "html-000008", "mixed-000003", "mega-000000"]:
        assert generate_doc(d) == generate_doc(d)


def test_generator_independent_of_order():
    a = generate_doc("pdfish-000001")
    generate_doc("html-000002")
    assert generate_doc("pdfish-000001") == a


def test_doc_ids_tiers():
    ids = doc_ids(9, skew_docs=2)
    assert len(ids) == 11
    assert ids[0].startswith("pdfish-") and ids[1].startswith("html-")
    assert ids[-1] == "mega-000001"


def test_oracle_output_contract():
    for d in doc_ids(12, skew_docs=1):
        spans, m = oracle(d)
        # array order == offset order, dense 0..n-1
        assert [s[3] for s in spans] == list(range(len(spans)))
        assert m["spans_out"] == len(spans)
        assert m["spans_in"] >= 1
        assert sum(m["drop_reasons"].values()) == m["dropped"]
        for k, t, r, _ in spans:
            assert k in {"text", "heading", "section", "cell", "media"}
            if k == "media":
                assert r and t == ""
            else:
                assert r == ""


def test_mega_doc_is_big():
    spans = generate_doc("mega-000000")
    assert len(spans) > 4000  # exceeds BIG_DOC_THRESHOLD -> skew path


def test_pdfish_offsets_stay_in_page_band():
    """Packed offsets must keep y < 1000 (page band) or span ordering
    could collide across pages."""
    for d in ["pdfish-000000", "pdfish-000011", "mega-000000", "mega-000003"]:
        for _k, _t, _r, off in generate_doc(d):
            y = off % 1_000_000 // 1_000
            assert 0 <= y < 1000, (d, off)
