"""HTML main-content extraction kernel (pure Python, regex tokenizer).

Readability/Boilerpipe-style boilerplate stripping (public algorithms:
Kohlschütter et al., "Boilerplate Detection using Shallow Text Features",
WSDM 2010), re-expressing the reference's main-content segmentation intent
(docpact region classification compress.py:1048-1189) and its HTML table
grid semantics with colspan/rowspan expansion
(docpact html_extractor.py:194-332).

Tokenization is a quote-aware regex scan (``_FastTokenizer``) rather than
stdlib ``html.parser`` — the stdlib parser dominated the kernel profile
(~24% of total extraction CPU) because it regex-parses every attribute of
every tag; here attributes are parsed lazily, only for tags that carry
them. Event semantics match ``HTMLParser(convert_charrefs=True)``: data
coalesced between tags with charrefs decoded, tag/attr names lowercased,
attr values unescaped, self-closing tags delivered as start+end,
script/style content consumed raw until the matching close tag,
comments/doctype/PIs ignored. The block-model handlers are a mixin shared
with the differential pytest that drives them through the real stdlib
parser and asserts byte-identical block streams.

Block model: the parser flattens the DOM into content blocks
(p/h1..h6/li/div-text/table/img). Per text block we track total text
length and the text length inside <a> tags; a block is boilerplate when
  - it sits under nav/header/footer/aside, or
  - its container class mentions cookie/banner/sidebar/menu/ad, or
  - link density  (link_text / text) > 0.5, or
  - it is short (< 25 chars) and contains a link.
Boilerplate is dropped and counted in drop_reasons["boilerplate"].

Output spans: heading / text / cell (row-major, spans expanded) / media,
ordered by document position, offsets 0..n-1.
"""

from __future__ import annotations

import re
from html import unescape

from .common import (
    KIND_CELL,
    KIND_HEADING,
    KIND_MEDIA,
    KIND_TEXT,
    drop,
    finalize,
    new_metrics,
)
from .normalize import normalize_text

_SECTION_TAGS = {"nav", "header", "footer", "aside"}
_BP_CLASS_WORDS = ("cookie", "banner", "sidebar", "menu", "advert", "ad-", "promo")
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_BLOCK_TAGS = {"p", "li", "div", "td", "th", "caption"} | _HEADING_TAGS
_VOID_TAGS = {"img", "br", "hr", "meta", "link", "input"}


class _BlockHandlers:
    """The block model, parser-agnostic: receives start/end/data events
    with lowercased tag names and attrs as a dict (values unescaped).
    Driven by ``_FastTokenizer`` in production and by stdlib
    ``HTMLParser`` in the differential test."""

    def __init__(self) -> None:
        self.blocks: list[dict] = []  # {type, text, link_len, bp_ctx, tag, ...}
        self._stack: list[str] = []
        self._bp_depth = 0  # depth inside nav/header/footer/aside or bp class
        self._bp_stack: list[bool] = []
        self._a_depth = 0
        self._cur: dict | None = None
        self._table: dict | None = None  # {rows: [[cell,...]], in_row, bp}
        self._cell: dict | None = None
        self._skip_depth = 0  # script/style

    def _blockish_ctx(self) -> bool:
        return self._bp_depth > 0

    def handle_starttag(self, tag, attrs):
        cls = attrs.get("class") or ""
        is_bp_container = tag in _SECTION_TAGS or (
            cls and any(w in cls.lower() for w in _BP_CLASS_WORDS)
        )
        if tag not in _VOID_TAGS:
            self._stack.append(tag)
            self._bp_stack.append(is_bp_container)
            if is_bp_container:
                self._bp_depth += 1
        if tag in ("script", "style"):
            self._skip_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag == "img":
            src = attrs.get("src") or ""
            self.blocks.append(
                {"type": "img", "ref": src, "bp": self._blockish_ctx()}
            )
            return
        if tag == "table":
            self._table = {"rows": [], "bp": self._blockish_ctx()}
            return
        if self._table is not None:
            if tag == "tr":
                self._table["rows"].append([])
            elif tag in ("td", "th"):
                self._cell = {
                    "text": [],
                    "colspan": int(attrs.get("colspan") or 1),
                    "rowspan": int(attrs.get("rowspan") or 1),
                }
            return
        if tag in _BLOCK_TAGS:
            self._flush_cur()
            self._cur = {
                "type": "heading" if tag in _HEADING_TAGS else "text",
                "text": [],
                "link_len": 0,
                "bp": self._blockish_ctx(),
            }

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._skip_depth = max(0, self._skip_depth - 1)
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if self._table is not None:
            if tag in ("td", "th") and self._cell is not None:
                row = self._table["rows"][-1] if self._table["rows"] else None
                if row is None:
                    self._table["rows"].append([])
                    row = self._table["rows"][-1]
                self._cell["text"] = normalize_text(" ".join(self._cell["text"]))
                row.append(self._cell)
                self._cell = None
            elif tag == "table":
                t = self._table
                self._table = None
                self.blocks.append({"type": "table", "table": t, "bp": t["bp"]})
        elif tag in _BLOCK_TAGS:
            self._flush_cur()
        # unwind stack
        if tag not in _VOID_TAGS:
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i] == tag:
                    if self._bp_stack[i]:
                        self._bp_depth -= 1
                    del self._stack[i]
                    del self._bp_stack[i]
                    break

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._cell is not None:
            self._cell["text"].append(data)
            return
        if self._cur is not None:
            self._cur["text"].append(data)
            if self._a_depth:
                self._cur["link_len"] += len(data.strip())

    def _flush_cur(self):
        if self._cur is None:
            return
        text = normalize_text(" ".join(self._cur["text"]))
        if text:
            self.blocks.append(
                {
                    "type": self._cur["type"],
                    "text": text,
                    "link_len": self._cur["link_len"],
                    "bp": self._cur["bp"],
                }
            )
        self._cur = None


# Tokenizer. Quote-aware scan; attrs parsed only when '=' present, and
# only the four attributes the handlers read matter (class/src/colspan/
# rowspan) — equivalence with HTMLParser's attr lists is pinned by the
# differential test in tests/test_kernels.py.
_TAG_NAME_RE = re.compile(r"<(/?)([a-zA-Z][^\t\n\r\f />]*)")
_TAG_REST_RE = re.compile(r"""(?:"[^"]*"|'[^']*'|[^>"'])*>""")
_ATTR_RE = re.compile(r"""([^\s=/>]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""")
_RAWTEXT_CLOSE = {
    t: re.compile(r"</\s*%s[^>]*>" % t, re.I) for t in ("script", "style")
}
_EMPTY_ATTRS: dict = {}  # shared; handlers only .get(), never mutate
# Trailing '/' that stdlib HTMLParser absorbs into an unquoted attr
# value (attrfind_tolerant's value alt `(?![\'"])[^>\s]*` eats it).
_UNQUOTED_SLASH_RE = re.compile(r"""=\s*(?!["'])[^\s>]*/$""")


def _parse_attrs(s: str) -> dict:
    out: dict = {}
    for m in _ATTR_RE.finditer(s):
        v = m.group(2)
        if v is not None:
            if v[:1] in ('"', "'"):
                v = v[1:-1]
            if "&" in v:
                v = unescape(v)
        out[m.group(1).lower()] = v
    return out


class _Parser(_BlockHandlers):
    """Regex tokenizer delivering ``HTMLParser(convert_charrefs=True)``-
    equivalent events: data coalesced between tags/comments (charrefs
    decoded), lowercased names, self-closing = start+end, script/style
    consumed raw to the matching close tag (no charref decode, no end
    event at EOF), comments/doctype/PIs skipped, stray ``<`` kept as
    data. Unterminated tags at EOF drop the tail (inputs are whole
    documents, not streamed chunks)."""

    def feed(self, html: str) -> None:
        pos, n = 0, len(html)
        find = html.find
        parts: list[str] = []

        def flush() -> None:
            if parts:
                text = "".join(parts)
                parts.clear()
                if "&" in text:
                    text = unescape(text)
                self.handle_data(text)

        while pos < n:
            lt = find("<", pos)
            if lt < 0:
                parts.append(html[pos:])
                break
            if lt > pos:
                parts.append(html[pos:lt])
            m = _TAG_NAME_RE.match(html, lt)
            if m is None:
                nxt = html[lt + 1 : lt + 2]
                if nxt in ("!", "?"):
                    flush()  # comments split data runs, as in stdlib
                    if html.startswith("<!--", lt):
                        end = find("-->", lt + 4)
                        pos = n if end < 0 else end + 3
                    else:
                        end = find(">", lt + 1)
                        pos = n if end < 0 else end + 1
                else:
                    parts.append("<")
                    pos = lt + 1
                continue
            flush()
            tag = m.group(2).lower()
            rest = _TAG_REST_RE.match(html, m.end())
            if rest is None:
                break
            pos = rest.end()
            if m.group(1):
                self.handle_endtag(tag)
                continue
            attrs_str = html[m.end() : pos - 1]
            stripped = attrs_str.rstrip()
            # stdlib's unquoted-value pattern [^>\s]* swallows a
            # trailing '/' into the attribute value (src=a/> means
            # value 'a/', NOT self-closing); only a '/' preceded by
            # whitespace, a quoted value, or a bare name self-closes.
            selfclosing = stripped.endswith("/") and not _UNQUOTED_SLASH_RE.search(
                stripped
            )
            if selfclosing:
                attrs_str = stripped[:-1]
            attrs = _parse_attrs(attrs_str) if "=" in attrs_str else _EMPTY_ATTRS
            self.handle_starttag(tag, attrs)
            if selfclosing:
                self.handle_endtag(tag)
            elif tag in _RAWTEXT_CLOSE:
                cm = _RAWTEXT_CLOSE[tag].search(html, pos)
                if cm is None:
                    self.handle_data(html[pos:])
                    pos = n
                else:
                    self.handle_data(html[pos : cm.start()])
                    pos = cm.end()
                    self.handle_endtag(tag)
        flush()


def expand_grid(rows: list[list[dict]]) -> list[list[str]]:
    """Colspan/rowspan occupancy expansion, row-major — same grid semantics
    as docpact html_extractor.py:256-311 (duplicated value into every
    covered cell)."""
    grid: list[list[str | None]] = []
    pending: dict[tuple[int, int], str] = {}  # (row, col) -> carried value
    for r_idx, row in enumerate(rows):
        out_row: list[str | None] = []
        col = 0
        cells = iter(row)
        while True:
            while (r_idx, col) in pending:
                out_row.append(pending.pop((r_idx, col)))
                col += 1
            cell = next(cells, None)
            if cell is None:
                break
            for _ in range(cell["colspan"]):
                out_row.append(cell["text"])
                for rs in range(1, cell["rowspan"]):
                    pending[(r_idx + rs, col)] = cell["text"]
                col += 1
        while (r_idx, col) in pending:
            out_row.append(pending.pop((r_idx, col)))
            col += 1
        grid.append([c if c is not None else "" for c in out_row])
    return grid


def _is_boilerplate(block: dict) -> bool:
    if block["bp"]:
        return True
    if block["type"] in ("img", "table"):
        return False
    text = block["text"]
    link_len = block.get("link_len", 0)
    if len(text) == 0:
        return True
    if link_len / len(text) > 0.5:
        return True
    if len(text) < 25 and link_len > 0:
        return True
    return False


def extract_html(html: str) -> tuple[list, dict]:
    """Extract main-content spans from one HTML document.

    Returns (ordered span tuples, metrics). drop_reasons counts one
    'boilerplate' per dropped block (not per character)."""
    p = _Parser()
    p.feed(html or "")
    p._flush_cur()
    metrics = new_metrics(1)  # one html span in
    out: list[tuple[str, str, str]] = []
    for b in p.blocks:
        if _is_boilerplate(b):
            drop(metrics, "boilerplate")
            continue
        if b["type"] == "img":
            if b["ref"]:
                out.append((KIND_MEDIA, "", b["ref"]))
        elif b["type"] == "table":
            for row in expand_grid(b["table"]["rows"]):
                for cell in row:
                    if cell:
                        out.append((KIND_CELL, cell, ""))
        elif b["type"] == "heading":
            out.append((KIND_HEADING, b["text"], ""))
        else:
            out.append((KIND_TEXT, b["text"], ""))
    return finalize([(k, t, m, 0) for k, t, m in out], metrics)


def extract_html_doc(spans: list[tuple]) -> tuple[list, dict]:
    """Document adapter: input spans hold the full HTML source in one
    ``kind='html'`` span (FIXTURES.md corpus 2); extra ``media`` input
    spans pass through after the parsed content."""
    html_src = ""
    passthrough = []
    for kind, text, ref, off in sorted(spans, key=lambda s: s[3]):
        if kind == "html":
            html_src += text or ""
        elif kind == "media":
            passthrough.append((KIND_MEDIA, "", ref or "", off))
    out, metrics = extract_html(html_src)
    metrics["spans_in"] = len(spans)
    if passthrough:
        base = len(out)
        out = out + [
            (k, t, m, base + i) for i, (k, t, m, _o) in enumerate(passthrough)
        ]
        metrics["spans_out"] = len(out)
    return out, metrics
