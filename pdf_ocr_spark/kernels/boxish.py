"""Slide/text-box extraction kernel (PPTX-family semantics).

Re-expresses (NOT ports) docpact pptx_extractor.py:
  - y/x clustering of free text boxes into rows/columns with the
    slide-specific tolerances (y 5pt, x 10pt) .......... :248-309
  - table detection from aligned box clusters, gated by the slide
    rules: >= 6 boxes on the slide, >= 3 run rows, span-count spread
    <= 3 .............................................. :352-430
  - table shapes pass through as cell grids ............ :144-196

Input spans: ``kind='box'`` text boxes and ``kind='media'`` images with
the packed ``slide*1_000_000 + y_centi*1_000 + x`` offset (same grid as
the pdfish corpus, FIXTURES.md). Output spans: heading / cell / text /
media in reading order, offsets re-sequenced 0..n-1.

The clustering/table primitives are shared with the pdfish kernel —
the reference's PPTX pipeline is the same algorithm family at different
tolerances, which is exactly why one parameterized implementation is
the right Spark-side shape (one mapInArrow kernel, dispatch by corpus).
"""

from __future__ import annotations

from .common import (
    KIND_CELL,
    KIND_HEADING,
    KIND_MEDIA,
    KIND_TEXT,
    drop,
    finalize,
    new_metrics,
)
from .normalize import normalize_text, ocr_repair
from .pdfish import (
    _NUMERIC_CELL_RE,
    _detect_table_runs,
    _estimate_header_count,
    decode_offset,
)


def _boxes_row_is_header(row: list) -> bool:
    """A run row with no numeric box is a header row (the pdfish rule,
    minus its pdf_text kind filter — slide boxes carry kind='box')."""
    texts = [s[3] for s in row if s[2] != "media"]
    return bool(texts) and not any(
        _NUMERIC_CELL_RE.match(t.strip()) for t in texts
    )

Y_BOX_TOL = 5  # pptx_extractor.py:248 (5pt rows)
X_BOX_TOL = 10  # pptx_extractor.py:309 (10pt column anchors on slides)


def _cluster_box_rows(items: list[tuple]) -> list[list]:
    """Greedy y-clustering with the slide tolerance (items sorted fully
    so output is independent of input order)."""
    if not items:
        return []
    items = sorted(items)
    rows: list[list] = [[items[0]]]
    last_y = items[0][0]
    for it in items[1:]:
        if it[0] - last_y <= Y_BOX_TOL:
            rows[-1].append(it)
        else:
            rows.append([it])
        last_y = it[0]
    for r in rows:
        r.sort(key=lambda s: s[1])
    return rows


def extract_boxish(spans: list[tuple]) -> tuple[list, dict]:
    """Whole-document extraction over slides: cluster boxes per slide,
    mark aligned runs as tables (H7 headers), emit the rest as text."""
    slides: dict[int, list] = {}
    metrics = new_metrics(len(spans))
    for kind, text, ref, off in spans:
        slide, y, x = decode_offset(off)
        if kind != "media" and not (text or "").strip():
            drop(metrics, "empty")
            continue
        slides.setdefault(slide, []).append((y, x, kind, text or "", ref or ""))
    out: list[tuple[str, str, str]] = []
    for slide in sorted(slides):
        rows = _cluster_box_rows(slides[slide])
        in_table, runs = _detect_table_runs(rows, tol=X_BOX_TOL)
        # slide-specific table gates (pptx_extractor.py:352-380):
        # a slide needs >= min_rows*min_cols (6) boxes to host a table;
        # a run needs >= 3 rows; span counts across the run must stay
        # within a spread of 3 ("too variable, probably not a table")
        n_boxes = sum(1 for row in rows for s in row if s[2] != "media")
        kept = []
        for run in runs:
            counts = [
                sum(1 for s in rows[k] if s[2] != "media") for k in run
            ]
            if (
                n_boxes < 6
                or len(run) < 3
                or max(counts) - min(counts) > 3
            ):
                for k in run:
                    in_table[k] = False
            else:
                kept.append(run)
        runs = kept
        header_rows: set[int] = set()
        for run in runs:
            counts = [
                sum(1 for s in rows[k] if s[2] != "media") for k in run
            ]
            hc = _estimate_header_count(counts)
            if hc > 0:
                header_rows.update(run[:hc])
            else:
                first = [s for s in rows[run[0]] if s[2] != "media"]
                if first and _boxes_row_is_header(first):
                    header_rows.add(run[0])
        for idx, row in enumerate(rows):
            media = [s for s in row if s[2] == "media"]
            texts = [s for s in row if s[2] != "media"]
            for s in media:
                out.append((KIND_MEDIA, "", s[4]))
            if not texts:
                continue
            if in_table[idx]:
                if idx in header_rows:
                    for s in texts:
                        out.append((KIND_HEADING, normalize_text(s[3]), ""))
                else:
                    for s in texts:
                        out.append(
                            (KIND_CELL, ocr_repair(normalize_text(s[3])), "")
                        )
            else:
                for s in texts:
                    out.append((KIND_TEXT, normalize_text(s[3]), ""))
    return finalize([(k, t, m, 0) for k, t, m in out], metrics)
