"""Grid/spreadsheet extraction kernel (pure Python, no Spark imports).

Re-expresses the semantics (NOT the code) of the reference's
grid-shaped extractors — the XLSX family (SURVEY.md §2.1–2.2):
  - merged-cell expansion (top-left value fills the range)
      ................................. docpact xlsx_extractor.py:237-318
  - hidden row/column skip (XH3) ...... xlsx_extractor.py:319-346
  - aggregation-row strip (total/subtotal leaders)
      ................................. xlsx_extractor.py:983-1034
  - trailing footnote-row strip ....... xlsx_extractor.py:924-981
  - trailing empty-column trim ........ xlsx_extractor.py:794-922
  - merge-based multi-row header estimation: last horizontal-merge row
    within the first 10, extended while rows stay all-string (TH2) —
    the XLSX/DOCX DH2 rule ............ xlsx_extractor.py:377-430
  - compound column names from multi-row headers: per-row forward
    fill, vertical " / " stack, consecutive-duplicate collapse
      ................................. xlsx_extractor.py:434-476
  - title-row detection (XH2): single originally-filled cell atop a
    multi-row header block ............ xlsx_extractor.py:478-496
  - fallback header row = first non-numeric row

Input spans (corpus ``grid-``):
  kind='grid_cell'        text=value        offset=sheet*1_000_000+row*1_000+col
  kind='grid_merge'       text='r0,c0,r1,c1' (inclusive range, top-left holds value)
  kind='grid_hidden_row'  text=row index
  kind='grid_hidden_col'  text=col index
  kind='media'            media_ref set    offset as grid_cell (embedded chart/img)

Output: ordered (heading|cell|media) spans, row-major per sheet, offsets
re-sequenced 0..n-1; dropped rows/cols counted in metrics drop_reasons
(hidden_row, hidden_col, aggregation_row, footnote_row).
"""

from __future__ import annotations

import re

from .common import (
    KIND_CELL,
    KIND_HEADING,
    KIND_MEDIA,
    drop,
    finalize,
    new_metrics,
)
from .normalize import normalize_text

_AGG_RE = re.compile(r"^\s*(grand\s+)?(sub)?total\b", re.I)
_FOOTNOTE_RE = re.compile(r"^\s*(\*+\s|note[:\s]|source[:\s])", re.I)
_NUM_RE = re.compile(r"^\(?[+-]?[\d,. ]+%?\)?$")


def decode_grid_offset(off: int) -> tuple[int, int, int]:
    sheet, rem = divmod(off, 1_000_000)
    row, col = divmod(rem, 1_000)
    return sheet, row, col


def _expand_merges(cells: dict, merges: list[tuple[int, int, int, int]]) -> None:
    """Fill every cell of each merged range with the top-left value
    (xlsx_extractor.py:237-318 semantics)."""
    for r0, c0, r1, c1 in merges:
        val = cells.get((r0, c0), "")
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                cells[(r, c)] = val


_HEADER_SCAN = 10  # xlsx_extractor.py:385 max_scan


def _estimate_header_rows(
    rows: list[int],
    row_values,
    merges: list[tuple[int, int, int, int]],
) -> int:
    """Merge-based header estimation (xlsx_extractor.py:377-430
    semantics, mirroring DOCX's DH2): (1) the LAST row within the first
    ``_HEADER_SCAN`` rows that starts a HORIZONTAL merge (a range
    spanning multiple columns — vertical-only merges are row-label
    grouping, not headers) anchors the header block; (2) the block
    extends past it while rows stay all-string (TH2: no numeric cell).
    Returns the header row count; 0 when no horizontal merge exists
    (callers fall back to the first-non-numeric-row rule)."""
    scan = set(rows[:_HEADER_SCAN])
    h_merge_rows = [
        r0 for r0, c0, _r1, c1 in merges if c1 > c0 and r0 in scan
    ]
    if not h_merge_rows:
        return 0
    last = max(h_merge_rows)
    k = next(i for i, r in enumerate(rows) if r >= last) + 1
    while k < len(rows):
        filled = [v for v in row_values(rows[k]) if v.strip()]
        if not filled or any(_NUM_RE.match(v.strip()) for v in filled):
            break
        k += 1
    return k


def _compound_headers(
    header_rows: list[int],
    row_values,
) -> list[str]:
    """Compound column names from a multi-row header block
    (xlsx_extractor.py:434-476 semantics): forward-fill each header row
    independently, then stack rows per column with " / ", collapsing
    consecutive duplicate fragments (merge expansion makes the fill a
    no-op over merged ranges; it still recovers sparse typed rows)."""
    filled_rows: list[list[str]] = []
    for r in header_rows:
        filled, last = [], ""
        for v in row_values(r):
            v = v.strip()
            if v:
                last = v
            filled.append(v or last)
        filled_rows.append(filled)
    names = []
    for ci in range(len(filled_rows[0])):
        parts: list[str] = []
        for fr in filled_rows:
            v = fr[ci]
            if v and (not parts or v != parts[-1]):
                parts.append(v)
        names.append(" / ".join(parts))
    return names


def _extract_sheet(
    cells: dict,
    media: list[tuple[int, int, str]],
    merges: list,
    hidden_rows: set[int],
    hidden_cols: set[int],
    metrics: dict,
) -> list[tuple[str, str, str]]:
    # pre-expansion fill map: XH2 title detection counts ORIGINALLY
    # filled cells (a full-width merged title has one source cell)
    orig_filled = {k for k, v in cells.items() if (v or "").strip()}
    _expand_merges(cells, merges)

    for (r, c) in list(cells):
        if r in hidden_rows:
            del cells[(r, c)]
            drop(metrics, "hidden_row")
        elif c in hidden_cols:
            del cells[(r, c)]
            drop(metrics, "hidden_col")

    if not cells and not media:
        return []

    rows = sorted({r for r, _c in cells})
    cols = sorted({c for _r, c in cells})

    # trailing empty-column trim: drop trailing columns whose every cell
    # is blank (xlsx_extractor.py:794-922)
    while cols:
        last = cols[-1]
        if any((r, last) in cells and cells[(r, last)].strip() for r in rows):
            break
        for r in rows:
            cells.pop((r, last), None)
        cols.pop()

    def row_values(r):
        return [cells.get((r, c), "") for c in cols]

    # trailing footnote-row strip: bottom-up single-filled-cell rows
    # matching footnote patterns (xlsx_extractor.py:924-981)
    while rows:
        vals = [v for v in row_values(rows[-1]) if v.strip()]
        if len(vals) == 1 and _FOOTNOTE_RE.match(vals[0]):
            for c in cols:
                cells.pop((rows[-1], c), None)
            rows.pop()
            drop(metrics, "footnote_row")
        else:
            break

    out: list[tuple[str, str, str]] = []
    media_by_row: dict[int, list] = {}
    for r, c, ref in media:
        media_by_row.setdefault(r, []).append((c, ref))

    # multi-row headers from horizontal merges (DH2); fallback to the
    # first-non-numeric-row rule when no horizontal merge exists
    merge_header_count = _estimate_header_rows(rows, row_values, merges)
    header_block = rows[:merge_header_count]

    if header_block:
        # XH2 title row: exactly one originally-filled cell atop a
        # multi-row block is a title, not a column header
        if len(header_block) > 1:
            src = [c for c in cols if (header_block[0], c) in orig_filled]
            if len(src) == 1:
                out.append(
                    (KIND_HEADING,
                     normalize_text(cells[(header_block[0], src[0])]), "")
                )
                for c, ref in sorted(media_by_row.pop(header_block[0], [])):
                    out.append((KIND_MEDIA, "", ref))
                header_block = header_block[1:]
        for name in _compound_headers(header_block, row_values):
            if name:
                out.append((KIND_HEADING, normalize_text(name), ""))
        for r in header_block:
            for c, ref in sorted(media_by_row.pop(r, [])):
                out.append((KIND_MEDIA, "", ref))

    header_set = set(rows[:merge_header_count])
    header_emitted = bool(header_block)
    for r in rows:
        if r in header_set:
            continue
        vals = row_values(r)
        filled = [v for v in vals if v.strip()]
        if not filled:
            continue
        # aggregation-row strip (xlsx_extractor.py:983-1034)
        if _AGG_RE.match(filled[0]):
            drop(metrics, "aggregation_row", len(filled))
            continue
        is_header = not header_emitted and not any(
            _NUM_RE.match(v.strip()) for v in filled
        )
        kind = KIND_HEADING if is_header else KIND_CELL
        if is_header:
            header_emitted = True
        for c, v in zip(cols, vals):
            if v.strip():
                out.append((kind, normalize_text(v), ""))
        for c, ref in sorted(media_by_row.pop(r, [])):
            out.append((KIND_MEDIA, "", ref))
    # media on rows without cells (e.g. below the table), row order
    for r in sorted(media_by_row):
        for c, ref in sorted(media_by_row[r]):
            out.append((KIND_MEDIA, "", ref))
    return out


def extract_grid_doc(spans: list[tuple]) -> tuple[list, dict]:
    """Whole-document grid extraction: sheets ascending, each sheet
    expanded/filtered/trimmed, offsets re-sequenced 0..n-1."""
    metrics = new_metrics(len(spans))
    sheets: dict[int, dict] = {}

    def sheet(s):
        return sheets.setdefault(
            s,
            {"cells": {}, "media": [], "merges": [],
             "hidden_rows": set(), "hidden_cols": set()},
        )

    for kind, text, ref, off in spans:
        s, r, c = decode_grid_offset(off)
        sh = sheet(s)
        if kind == "grid_cell":
            sh["cells"][(r, c)] = text or ""
        elif kind == "media":
            sh["media"].append((r, c, ref or ""))
        elif kind == "grid_merge":
            r0, c0, r1, c1 = (int(x) for x in (text or "").split(","))
            sh["merges"].append((r0, c0, r1, c1))
        elif kind == "grid_hidden_row":
            sh["hidden_rows"].add(int(text))
        elif kind == "grid_hidden_col":
            sh["hidden_cols"].add(int(text))
        else:
            drop(metrics, "unknown_kind")

    out: list[tuple[str, str, str]] = []
    for s in sorted(sheets):
        sh = sheets[s]
        out.extend(
            _extract_sheet(
                sh["cells"], sh["media"], sh["merges"],
                sh["hidden_rows"], sh["hidden_cols"], metrics,
            )
        )
    return finalize([(k, t, m, 0) for k, t, m in out], metrics)
