"""Document-flow extraction kernel (DOCX family; pure Python, no Spark).

Re-expresses the semantics (NOT the code) of the reference's Word
extractor — a document is a SEQUENCE of paragraphs and explicit-grid
tables in flow order (no pages, no spatial inference; docpact
docx_extractor.py):
  - explicit grid from (row, col) cells with merged-cell expansion
    (gridSpan/vMerge ranges; the python-docx _tc-dedup problem DH1 is
    an artifact of that library and cannot occur in the span model)
      ................................. docx_extractor.py:237-318
  - DH2 merge-based header detection: the LAST row within the first 10
    that starts a horizontal merge anchors the header block, extended
    while rows stay all-string ........ docx_extractor.py:344-388
  - DH3 title-row detection: a single non-empty cell in row 0 above a
    multi-row header block is the table title; fallback: a short
    heading-styled paragraph directly before the table
      ................................. docx_extractor.py:DH3
  - DH4 compound headers with BOUNDARY-AWARE forward-fill: " / "
    stacking where the fill never bleeds from the leftmost text index
    columns into numeric data columns .. docx_extractor.py:390-450
  - trailing empty-column strip ........ compress_docx_table
  - paragraphs: heading-styled emit as section labels, plain as text

Input spans (corpus ``flow-``), offset = block*1_000_000 + row*1_000
+ col with blocks in document order:
  kind='para'   text=paragraph      media_ref '' | 'st:h' (heading style)
  kind='cell'   text=value          offset addresses (block, row, col)
  kind='merge'  text='r0,c0,r1,c1'  inclusive range, top-left holds value
  kind='media'  media_ref set       inline image at its block position

Output: ordered (heading|cell|section|text|media) spans in flow order,
offsets re-sequenced 0..n-1.
"""

from __future__ import annotations

from .common import (
    KIND_CELL,
    KIND_HEADING,
    KIND_MEDIA,
    KIND_SECTION,
    KIND_TEXT,
    drop,
    finalize,
    new_metrics,
)
from .gridk import (
    _compound_headers,
    _expand_merges,
    _h7_count,
    _th2_count,
)
from .normalize import normalize_text

_HEADER_SCAN = 10  # docx_extractor.py:344 max_scan
_TITLE_PARA_MAX = 60  # short heading paragraph -> pre-table title


def decode_flow_offset(off: int) -> tuple[int, int, int]:
    """(block, row, col) from a packed flow offset."""
    return off // 1_000_000, (off // 1_000) % 1_000, off % 1_000


def _dh2_flow_count(
    grid: list[list[str]], merges: list[tuple[int, int, int, int]]
) -> int:
    """DH2 (docx_extractor.py:344-388): scan the first ``_HEADER_SCAN``
    rows for merge indicators — a gridSpan start (c1 > c0) or a vMerge
    range that STARTS inside the window (the reference only inspects
    ``table.rows[:max_scan]``, so a body vMerge starting past the
    window contributes nothing) — and take the LAST covered in-window
    row; every row through it is a header. 0 when the scan window has
    no merge indicator (the title-above-merges case is why the scan
    runs forward instead of stopping at the first merge-free row)."""
    scan = min(_HEADER_SCAN, len(grid))
    last = -1
    for r0, c0, r1, c1 in merges:
        if c1 > c0 and r0 < scan:
            last = max(last, r0)
        if r1 > r0 and r0 < scan:
            last = max(last, min(r1, scan - 1))
    return last + 1


def _emit_table(
    cells: dict,
    merges: list[tuple[int, int, int, int]],
    title_para: str | None,
    metrics: dict,
    out: list,
) -> bool:
    """Emit one table block; returns whether ``title_para`` was
    consumed as the table title (DH3 fallback)."""
    orig_filled = {k for k, v in cells.items() if (v or "").strip()}
    _expand_merges(cells, merges)
    if not cells:
        return False
    n_rows = max(r for r, _c in cells) + 1
    n_cols = max(c for _r, c in cells) + 1
    grid = [
        [cells.get((r, c), "") for c in range(n_cols)]
        for r in range(n_rows)
    ]

    # layered header estimation: DH2 merges, falling back to the
    # format-agnostic TH2/H7 (classification is format-agnostic in the
    # reference; classify.py operates on the same compressed shape)
    hc = max(_dh2_flow_count(grid, merges), _th2_count(grid), _h7_count(grid))
    hc = min(hc, len(grid))

    # DH3 title: a single originally-filled cell in row 0 above a
    # multi-row header block is the in-table title; the preceding
    # heading paragraph is only the FALLBACK when no in-grid title
    # exists (docx_extractor.py DH3)
    titles: list[str] = []
    used_para = False
    if hc > 1:
        src = [c for c in range(len(grid[0])) if (0, c) in orig_filled]
        if len(src) == 1:
            titles.append(grid[0][src[0]])
            grid = grid[1:]
            hc -= 1
    if not titles and title_para and title_para.strip():
        titles.append(title_para)
        used_para = True

    # DH4 compound headers, boundary-aware vs the data rows
    names = (
        _compound_headers(grid[:hc], data_rows=grid[hc:]) if hc > 0 else []
    )
    data = grid[hc:]

    # trailing empty-column strip (compress_docx_table: a trailing
    # column drops when its built header name AND all its data cells
    # are empty)
    n_keep = len(grid[0]) if grid else 0
    while n_keep > 0:
        col = n_keep - 1
        h_empty = col >= len(names) or not names[col].strip()
        d_empty = all(not row[col].strip() for row in data)
        if h_empty and d_empty:
            n_keep -= 1
            drop(metrics, "empty_col")
        else:
            break
    if n_keep == 0:
        return used_para
    names = names[:n_keep]

    for title in titles:
        out.append((KIND_HEADING, normalize_text(title), ""))
    for name in names:
        if name:
            out.append((KIND_HEADING, normalize_text(name), ""))
    for row in data:
        for v in row[:n_keep]:
            if v.strip():
                out.append((KIND_CELL, normalize_text(v), ""))
    return used_para


def extract_flow_doc(spans: list[tuple]) -> tuple[list, dict]:
    """Whole-document flow extraction: blocks ascending; paragraph
    blocks classify by style, table blocks run DH2/DH3/DH4; offsets
    re-sequenced 0..n-1."""
    metrics = new_metrics(len(spans))
    blocks: dict[int, dict] = {}

    def blk(b):
        return blocks.setdefault(
            b, {"cells": {}, "merges": [], "para": None, "style": "",
                "media": []}
        )

    for kind, text, ref, off in spans:
        b, r, c = decode_flow_offset(off)
        bl = blk(b)
        if kind == "cell":
            bl["cells"][(r, c)] = text or ""
        elif kind == "para":
            bl["para"] = text or ""
            bl["style"] = ref or ""
        elif kind == "merge":
            r0, c0, r1, c1 = (int(x) for x in (text or "").split(","))
            bl["merges"].append((r0, c0, r1, c1))
        elif kind == "media":
            bl["media"].append(ref or "")
        else:
            drop(metrics, "unknown_kind")

    order = sorted(blocks)
    # DH3 pre-pass: a short heading-styled paragraph directly before a
    # table block is CONSUMED as that table's title (pre-table title
    # fallback), not emitted as a section label
    consumed: dict[int, str] = {}
    for i in range(1, len(order)):
        bl, prev = blocks[order[i]], blocks[order[i - 1]]
        if (
            bl["cells"]
            and prev["para"]
            and not prev["cells"]
            and prev["style"] == "st:h"
            and len(prev["para"]) <= _TITLE_PARA_MAX
        ):
            consumed[order[i - 1]] = prev["para"]

    out: list[tuple[str, str, str]] = []
    for i, b in enumerate(order):
        bl = blocks[b]
        if bl["cells"]:
            title_para = consumed.get(order[i - 1]) if i > 0 else None
            pos = len(out)
            used = _emit_table(
                bl["cells"], bl["merges"], title_para, metrics, out
            )
            if title_para and not used:
                # the table had its own in-grid title: the heading
                # paragraph stays a section label, in flow order
                out.insert(
                    pos, (KIND_SECTION, normalize_text(title_para), "")
                )
        elif bl["para"] is not None and b not in consumed:
            if not bl["para"].strip():
                drop(metrics, "empty")
            elif bl["style"] == "st:h":
                out.append((KIND_SECTION, normalize_text(bl["para"]), ""))
            else:
                out.append((KIND_TEXT, normalize_text(bl["para"]), ""))
        for ref in bl["media"]:
            out.append((KIND_MEDIA, "", ref))
    return finalize([(k, t, m, 0) for k, t, m in out], metrics)
