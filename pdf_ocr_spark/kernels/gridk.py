"""Grid/spreadsheet extraction kernel (pure Python, no Spark imports).

Re-expresses the semantics (NOT the code) of the reference's
grid-shaped extractors — the XLSX family (SURVEY.md §2.1–2.2):
  - merged-cell expansion (top-left value fills the range)
      ................................. docpact xlsx_extractor.py:237-318
  - hidden row/column skip (XH3) ...... xlsx_extractor.py:319-346
  - multi-table region detection (XH1): runs of >=2 blank rows split a
    sheet vertically, then runs of >=2 blank columns split each band;
    regions under 2x2 drop; no qualifying region -> whole bounds
      ................................. xlsx_extractor.py:593-649
  - noise-column trim (XH6): blank-column fence near an edge (section
    beyond <=40% width) + headerless sparse edge columns
      ................................. xlsx_extractor.py:790-900
  - layered header estimation = max of merge-based DH2 (last horizontal
    merge within the first 10 rows + all-string continuation,
    xlsx_extractor.py:377-430), type-pattern TH2 (consecutive
    all-string rows from top, heuristics.py:318-333), and span-count H7
    (bottom-2/3 cell-count signature, heuristics.py:269-315)
  - annotation header-block strip (XH5): sparse rows above a blank
    separator within the first 8 rows emit as text lines
      ................................. xlsx_extractor.py:707-787
  - title-row detection (XH2): single originally-filled cell atop a
    multi-row header block ............ xlsx_extractor.py:478-496
  - compound column names from multi-row headers: per-row forward
    fill, vertical " / " stack, consecutive-duplicate collapse
      ................................. xlsx_extractor.py:434-476
  - aggregation-row strip (total/subtotal leaders, XH8)
      ................................. xlsx_extractor.py:983-1034
  - trailing footnote-row strip (XH7) . xlsx_extractor.py:924-981

  - number-format type hints (XH4): "fmt:<number-format>" on a
    grid_cell's media_ref -> date/currency/percentage hint; date-hinted
    whole-day serials render as ISO dates (openpyxl value semantics)
      ................................. xlsx_extractor.py:348-374

Input spans (corpus ``grid-``):
  kind='grid_cell'        text=value        offset=sheet*1_000_000+row*1_000+col
                          media_ref optional "fmt:<number-format>" (XH4)
  kind='grid_merge'       text='r0,c0,r1,c1' (inclusive range, top-left holds value)
  kind='grid_hidden_row'  text=row index
  kind='grid_hidden_col'  text=col index
  kind='media'            media_ref set    offset as grid_cell (embedded chart/img)

Output: ordered (heading|cell|media|text) spans, region-major then
row-major per sheet, offsets re-sequenced 0..n-1; dropped rows/cols
counted in metrics drop_reasons (hidden_row, hidden_col,
aggregation_row, footnote_row, region_too_small).
"""

from __future__ import annotations

import re
from collections import Counter

from .common import (
    KIND_CELL,
    KIND_HEADING,
    KIND_MEDIA,
    KIND_TEXT,
    drop,
    finalize,
    new_metrics,
)
from .normalize import detect_cell_type, normalize_text

_AGG_RE = re.compile(r"^\s*(grand\s+)?(sub)?total\b", re.I)
_FOOTNOTE_RE = re.compile(r"^\s*(\*+\s|note[:\s]|source[:\s])", re.I)
_NUM_RE = re.compile(r"^\(?[+-]?[\d,. ]+%?\)?$")

# XH1 parameters (xlsx_extractor.py:593-599)
_MIN_BLANK_ROWS = 2
_MIN_BLANK_COLS = 2
_MIN_TABLE = (2, 2)

_HEADER_SCAN = 10  # xlsx_extractor.py:385 max_scan

# XH4 (xlsx_extractor.py:348-374): number-format string -> type hint.
# The format string rides the otherwise-unused media_ref of grid_cell
# spans as "fmt:<number-format>" (the span-model analogue of openpyxl's
# cell.number_format — same channel pattern as the pdfish style token).
_DATE_FMT_INDICATORS = ("yyyy", "yy", "mm", "dd", "mmm", "mmmm")
_CURRENCY_FMT_SYMBOLS = "$€£¥"
_EXCEL_EPOCH_ORDINAL = 693594  # date(1899, 12, 30).toordinal()
_SERIAL_RE = re.compile(r"^[0-9]+(\.0+)?$")


def format_hint(fmt: str | None) -> str | None:
    """XH4 type hint from a number-format string: 'date' when a date
    indicator appears (guarded by a y/d presence so time-only formats
    like 'hh:mm' stay None — the reference's exclusion), 'currency' on
    a currency symbol, 'percentage' on '%', else None."""
    if not fmt or fmt == "General":
        return None
    low = fmt.lower()
    if any(ind in low for ind in _DATE_FMT_INDICATORS):
        if "y" in low or "d" in low:
            return "date"
    if any(sym in fmt for sym in _CURRENCY_FMT_SYMBOLS):
        return "currency"
    if "%" in fmt:
        return "percentage"
    return None


def _render_hinted(text: str, fmt: str | None) -> str:
    """Value rendering for hinted cells. A whole-day Excel serial under
    a DATE-hinted format renders as its ISO date — the span-model twin
    of openpyxl converting date-formatted serials to datetime VALUES
    before the reference's grid is built (the reference then str()s the
    datetime; we render ISO, a documented deviation at the same value
    grain). Currency/percentage hints are display-only in openpyxl, so
    they never alter the value — they survive as XH4 metadata hints
    only (reference stores them in StructuredTable.metadata
    format_hints, xlsx_extractor.py:1186-1196, with no span effect)."""
    if fmt is None:
        return text
    if format_hint(fmt) == "date" and _SERIAL_RE.match(text.strip()):
        import datetime

        serial = int(float(text.strip()))
        return datetime.date.fromordinal(
            _EXCEL_EPOCH_ORDINAL + serial
        ).isoformat()
    return text


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


def _split_blank_runs(
    is_blank: list[bool], min_gap: int
) -> list[tuple[int, int]]:
    """Non-blank segments split by runs of >= ``min_gap`` blanks
    (xlsx_extractor.py:652-701 semantics); inclusive index pairs."""
    segs: list[tuple[int, int]] = []
    start = None
    i, n = 0, len(is_blank)
    while i < n:
        if not is_blank[i]:
            if start is None:
                start = i
            i += 1
            continue
        j = i
        while j < n and is_blank[j]:
            j += 1
        if start is not None and j - i >= min_gap:
            segs.append((start, i - 1))
            start = None
        i = j
    if start is not None:
        last = max(k for k in range(start, n) if not is_blank[k])
        segs.append((start, last))
    return segs


def _detect_regions(filled: set[tuple[int, int]]) -> list[tuple[int, int, int, int]]:
    """XH1 (xlsx_extractor.py:593-649): blank-run splitting of the
    occupied bounds into table regions (r0, r1, c0, c1 inclusive);
    regions under ``_MIN_TABLE`` drop; no qualifying region -> the
    whole bounds as one region."""
    rmin = min(r for r, _ in filled)
    rmax = max(r for r, _ in filled)
    cmin = min(c for _, c in filled)
    cmax = max(c for _, c in filled)
    row_blank = [
        all((r, c) not in filled for c in range(cmin, cmax + 1))
        for r in range(rmin, rmax + 1)
    ]
    regions: list[tuple[int, int, int, int]] = []
    for rs, re_ in _split_blank_runs(row_blank, _MIN_BLANK_ROWS):
        r0, r1 = rmin + rs, rmin + re_
        col_blank = [
            all((r, c) not in filled for r in range(r0, r1 + 1))
            for c in range(cmin, cmax + 1)
        ]
        for cs, ce in _split_blank_runs(col_blank, _MIN_BLANK_COLS):
            c0, c1 = cmin + cs, cmin + ce
            if r1 - r0 + 1 >= _MIN_TABLE[0] and c1 - c0 + 1 >= _MIN_TABLE[1]:
                regions.append((r0, r1, c0, c1))
    return regions or [(rmin, rmax, cmin, cmax)]


def _xh6_col_bounds(grid: list[list[str]], header_count: int) -> tuple[int, int]:
    """XH6 (xlsx_extractor.py:790-900): two-phase noise-column trim.
    Phase 1: an all-blank fence column near an edge trims itself and the
    small (<=40% of width) section beyond it. Phase 2: headerless edge
    columns with sparse data (<50% of data rows filled) trim inward.
    Returns the kept [start, end) column slice."""
    num_cols = len(grid[0]) if grid else 0
    num_rows = len(grid)
    if num_cols <= 1:
        return 0, num_cols
    start, end = 0, num_cols
    blank = [
        all(not grid[ri][ci].strip() for ri in range(num_rows))
        for ci in range(num_cols)
    ]
    for ci in range(end - 1, 0, -1):
        if blank[ci]:
            if (end - ci) / num_cols <= 0.4:
                end = ci
            break
    for ci in range(start, end):
        if blank[ci]:
            if (ci - start + 1) / num_cols <= 0.4:
                start = ci + 1
            break
    data_start = min(header_count, num_rows)
    dn = num_rows - data_start
    if dn > 0:
        while end > start + 1:
            ci = end - 1
            if any(grid[ri][ci].strip() for ri in range(data_start)):
                break
            if sum(
                1 for ri in range(data_start, num_rows) if grid[ri][ci].strip()
            ) / dn < 0.5:
                end -= 1
            else:
                break
        while start < end - 1:
            ci = start
            if any(grid[ri][ci].strip() for ri in range(data_start)):
                break
            if sum(
                1 for ri in range(data_start, num_rows) if grid[ri][ci].strip()
            ) / dn < 0.5:
                start += 1
            else:
                break
    return start, end


def _is_headerish_row(row: list[str]) -> bool:
    """TH2 row predicate (heuristics.py:247-261): no DATE/NUMBER cell."""
    return not any(detect_cell_type(v) in ("DATE", "NUMBER") for v in row)


def _th2_count(grid: list[list[str]]) -> int:
    """TH2 (heuristics.py:318-333): consecutive all-string rows from
    top. No-contrast guard (span-model deviation): when NO row in the
    grid is typed, the type channel carries no header signal — return 1
    (first-row header) instead of consuming the whole grid."""
    k = 0
    for row in grid:
        if not _is_headerish_row(row):
            break
        k += 1
    if k == len(grid):
        return 1 if len(grid) > 1 else 0
    return k


def _h7_count(grid: list[list[str]]) -> int:
    """H7 (heuristics.py:269-315): bottom-2/3 cell-count signature —
    top-3 most common counts (>=2 cells, frequency >=2) define data
    rows; the first data-like row from the top bounds the header."""
    n = len(grid)
    if n <= 2:
        return 0
    counts = [sum(1 for v in row if v.strip()) for row in grid]
    freq = Counter(counts[max(1, n // 3):])
    data = {c for c, f in freq.most_common(3) if c >= 2 and f >= 2}
    if not data:
        return 0
    mx = max(data)
    for i, c in enumerate(counts):
        if c in data or c > mx:
            return i
    return 0


def _dh2_count(
    grid: list[list[str]],
    row_ids: list[int],
    cols: list[int],
    merges: list[tuple[int, int, int, int]],
) -> int:
    """Merge-based header estimation (xlsx_extractor.py:377-430
    semantics, mirroring DOCX's DH2): (1) the LAST row within the first
    ``_HEADER_SCAN`` region rows that starts a HORIZONTAL merge
    overlapping the region's columns anchors the header block (vertical
    merges are row-label grouping, not headers); (2) the block extends
    while rows stay all-string (TH2). 0 when no such merge exists."""
    if not grid or not cols:
        return 0
    scan = set(row_ids[:_HEADER_SCAN])
    h_rows = [
        r0
        for r0, c0, _r1, c1 in merges
        if c1 > c0 and r0 in scan and not (c1 < cols[0] or c0 > cols[-1])
    ]
    if not h_rows:
        return 0
    last = max(h_rows)
    k = row_ids.index(last) + 1
    while k < len(grid) and _is_headerish_row(grid[k]):
        k += 1
    return k


def _xh5_strip(
    grid: list[list[str]], header_count: int
) -> tuple[list[str], int, int]:
    """XH5 (xlsx_extractor.py:707-787): sparse annotation block above
    the table, separated by a blank row within the first 8 rows — rows
    above must be <=50% filled, the first row below >=50%. Returns
    (block lines "; "-joined, rows stripped incl. the blank, adjusted
    header count)."""
    if not grid or header_count < 3 or len(grid) < 4 or not grid[0]:
        return [], 0, header_count
    num_cols = len(grid[0])
    blank_idx = -1
    for i in range(min(8, len(grid))):
        if not any(c.strip() for c in grid[i]):
            blank_idx = i
            break
    if blank_idx < 1:
        return [], 0, header_count
    for i in range(blank_idx):
        if sum(1 for c in grid[i] if c.strip()) / num_cols > 0.5:
            return [], 0, header_count
    below = blank_idx + 1
    if below >= len(grid):
        return [], 0, header_count
    if sum(1 for c in grid[below] if c.strip()) / num_cols < 0.5:
        return [], 0, header_count
    lines = []
    for i in range(blank_idx):
        cs = [c for c in grid[i] if c.strip()]
        if cs:
            lines.append("; ".join(cs))
    stripped = blank_idx + 1
    return lines, stripped, max(1, header_count - stripped)


def _classify_data_columns(
    data_rows: list[list[str]], num_cols: int
) -> list[str]:
    """DH4 column classification (docx_extractor.py:294-318): a column
    is "numeric" when >50% of its non-empty cells look numeric; empty
    columns default to numeric (prevents false index detection)."""
    types: list[str] = []
    for ci in range(num_cols):
        non_empty = numeric = 0
        for row in data_rows:
            v = row[ci].strip() if ci < len(row) else ""
            if not v:
                continue
            non_empty += 1
            if _NUM_RE.match(v):
                numeric += 1
        types.append(
            "numeric"
            if non_empty == 0 or numeric / non_empty > 0.5
            else "text"
        )
    return types


def _compound_headers(
    header_grid: list[list[str]],
    data_rows: list[list[str]] | None = None,
) -> list[str]:
    """Compound column names from a multi-row header block
    (xlsx_extractor.py:434-476 semantics): forward-fill each header row
    independently, then stack rows per column with " / ", collapsing
    consecutive duplicate fragments (merge expansion makes the fill a
    no-op over merged ranges; it still recovers sparse typed rows).

    With ``data_rows`` the fill is BOUNDARY-AWARE (DH4,
    docx_extractor.py:390-450): the leftmost contiguous text-typed
    columns are index columns, and a fill sourced inside them never
    bleeds into the numeric data columns — a merged "Region" label
    stays out of "2025"-style data headers."""
    index_cols: set[int] = set()
    if data_rows is not None and header_grid:
        types = _classify_data_columns(data_rows, len(header_grid[0]))
        for ci, ty in enumerate(types):
            if ty != "text":
                break
            index_cols.add(ci)
    filled_rows: list[list[str]] = []
    for row in header_grid:
        filled: list[str] = []
        last, src = "", -1
        for ci, v in enumerate(row):
            v = v.strip()
            if v:
                last, src = v, ci
                filled.append(v)
            elif src in index_cols and ci not in index_cols:
                filled.append("")
            else:
                filled.append(last)
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


def _emit_region(
    region: tuple[int, int, int, int],
    cells: dict,
    orig_filled: set,
    merges: list,
    media_by_row: dict,
    metrics: dict,
    out: list,
) -> None:
    r0, r1, c0, c1 = region
    row_ids = list(range(r0, r1 + 1))
    cols = list(range(c0, c1 + 1))
    grid = [[cells.get((r, c), "") for c in cols] for r in row_ids]

    def emit_media(r):
        for _c, ref in sorted(media_by_row.pop(r, [])):
            out.append((KIND_MEDIA, "", ref))

    # XH6 noise-column trim (preliminary header_count=1, as the caller
    # at xlsx_extractor.py:1123-1129 does)
    s, e = _xh6_col_bounds(grid, 1)
    if (s, e) != (0, len(cols)):
        cols = cols[s:e]
        grid = [row[s:e] for row in grid]

    # layered header estimation: max of DH2 / TH2 / H7
    # (xlsx_extractor.py:1133-1152)
    hc = max(
        _dh2_count(grid, row_ids, cols, merges),
        _th2_count(grid),
        _h7_count(grid),
    )

    # XH5 annotation block -> text lines
    lines, stripped, hc = _xh5_strip(grid, hc)
    for ln in lines:
        out.append((KIND_TEXT, normalize_text(ln), ""))
    for r in row_ids[:stripped]:
        emit_media(r)
    grid, row_ids = grid[stripped:], row_ids[stripped:]

    # XH2 title row: single originally-filled cell atop a multi-row block
    if hc > 1 and grid:
        src = [c for c in cols if (row_ids[0], c) in orig_filled]
        if len(src) == 1:
            out.append(
                (KIND_HEADING,
                 normalize_text(cells[(row_ids[0], src[0])]), "")
            )
            emit_media(row_ids[0])
            grid, row_ids = grid[1:], row_ids[1:]
            hc -= 1

    # compound header emission (DH4 boundary-aware fill vs data rows)
    hc = min(hc, len(grid))
    if hc > 0:
        for name in _compound_headers(grid[:hc], data_rows=grid[hc:]):
            if name:
                out.append((KIND_HEADING, normalize_text(name), ""))
        for r in row_ids[:hc]:
            emit_media(r)
        grid, row_ids = grid[hc:], row_ids[hc:]

    # XH7 trailing footnote-row strip (bottom-up single-filled rows)
    while grid:
        filled = [v for v in grid[-1] if v.strip()]
        if len(filled) == 1 and _FOOTNOTE_RE.match(filled[0]):
            drop(metrics, "footnote_row")
            grid.pop()
            row_ids.pop()
        else:
            break

    # data rows (XH8 aggregation strip inline)
    for row, r in zip(grid, row_ids):
        filled = [v for v in row if v.strip()]
        if not filled:
            continue
        if _AGG_RE.match(filled[0]):
            drop(metrics, "aggregation_row", len(filled))
            continue
        for v in row:
            if v.strip():
                out.append((KIND_CELL, normalize_text(v), ""))
        emit_media(r)


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
            orig_filled.discard((r, c))
            drop(metrics, "hidden_row")
        elif c in hidden_cols:
            del cells[(r, c)]
            orig_filled.discard((r, c))
            drop(metrics, "hidden_col")

    if not cells and not media:
        return []

    out: list[tuple[str, str, str]] = []
    media_by_row: dict[int, list] = {}
    for r, c, ref in media:
        media_by_row.setdefault(r, []).append((c, ref))

    filled = {k for k, v in cells.items() if (v or "").strip()}
    if filled:
        regions = _detect_regions(filled)
        covered = {
            k for k in filled
            if any(
                r0 <= k[0] <= r1 and c0 <= k[1] <= c1
                for r0, r1, c0, c1 in regions
            )
        }
        for k in filled - covered:
            drop(metrics, "region_too_small")
        for region in sorted(regions):
            _emit_region(
                region, cells, orig_filled, merges, media_by_row, metrics, out
            )
    # media on rows no region consumed (e.g. below the table), row order
    for r in sorted(media_by_row):
        for _c, ref in sorted(media_by_row[r]):
            out.append((KIND_MEDIA, "", ref))
    return out


def extract_grid_doc(spans: list[tuple]) -> tuple[list, dict]:
    """Whole-document grid extraction: sheets ascending, each sheet
    region-split/expanded/filtered/trimmed, offsets re-sequenced
    0..n-1."""
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
            fmt = ref[4:] if ref and ref.startswith("fmt:") else None
            sh["cells"][(r, c)] = _render_hinted(text or "", fmt)
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
