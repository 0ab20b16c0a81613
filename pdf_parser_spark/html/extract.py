"""Main-content extraction from HTML bytes.

Stdlib ``html.parser`` DOM walk (lxml is unavailable by design —
SURVEY.md §7.0) with boilerplate stripping:

* hard-drop subtrees: script/style/nav/footer/header/aside/form/...
* per-block link-density filter: a text block survives iff
  ``anchor_chars / chars <= max_link_density``, with a minimum-length
  gate for linky short blocks (config.HTML).
* headings survive independently of length when link-free.

Output is deterministic: kept blocks in document order, whitespace
inside a block collapsed to single spaces, blocks joined by '\\n'.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

from ..config import HTML

_WS_RE = re.compile(r"\s+")

_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base",
         "col", "embed", "source", "track", "wbr"}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


@dataclass(slots=True)
class _Node:
    """Element node. TEXT nodes are plain ``str`` objects in
    ``children`` (r6: one allocation instead of a _Node per text run —
    text made up ~half of all nodes; the unused ``parent``/``text``
    fields are gone too)."""

    tag: str
    children: list = field(default_factory=list)
    attrs: dict | None = None      # element attributes


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: unclosed tags close implicitly; stray close
    tags are ignored (html-malformed fixture must not crash).

    Kept as the reference implementation; ``_fast_tree`` below produces
    the same tree ~4x faster and is A/B-tested against this in
    tests/test_html.py."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node(tag="#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag=tag)
        node.attrs = dict(attrs)
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag=tag)
        node.attrs = dict(attrs)
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # close the nearest matching open tag; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


_TAG_RE = re.compile(
    r"<!--.*?-->"                 # comments
    r"|<!\[CDATA\[.*?\]\]>"       # cdata
    r"|<![^>]*>"                  # doctype / bogus decl
    r"|<\?[^>]*>"                 # processing instruction
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:-]*)"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>",
    re.S,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][a-zA-Z0-9_:.-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?")
_RAWTEXT = {"script", "style"}
# close tags are case-insensitive (</SCRIPT> is valid HTML; a
# case-sensitive find would miss it and silently drop the whole rest
# of the document at the raw-text skip)
_RAW_CLOSE = {t: re.compile("</" + t, re.I) for t in _RAWTEXT}
_ATTR_TAGS = {"td", "th", "html"}  # the only tags whose attrs are read
_EMPTY_ATTRS: dict = {}  # shared read-only empty attrs (never mutated)


def _fast_tree(html_str: str) -> _Node:
    """Regex tokenizer producing the same tree as _TreeBuilder: implicit
    closing, stray end tags ignored, entities decoded in text, raw-text
    elements (script/style) skipped to their close tag.

    r6 micro-shape (measured ~1.6x): one ``group(1,2,3,4)`` call per
    tag instead of four, a local ``children`` alias maintained across
    push/pop (drops two attribute loads per append), text runs appended
    as plain strings, and the empty-attrs dict shared."""
    root = _Node(tag="#root")
    stack = [root]
    children = root.children
    pos = 0
    n = len(html_str)
    search = _TAG_RE.search
    while pos < n:
        m = search(html_str, pos)
        if not m:
            rest = html_str[pos:]
            if rest:
                children.append(
                    unescape(rest) if "&" in rest else rest)
            break
        start = m.start()
        if start > pos:
            data = html_str[pos:start]
            children.append(unescape(data) if "&" in data else data)
        pos = m.end()
        closing, tag, attrs_s, selfclose = m.group(1, 2, 3, 4)
        if tag is None:
            continue  # comment/doctype/cdata
        tag = tag.lower()
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    children = stack[-1].children
                    break
            continue
        node = _Node(tag)
        # attrs are consumed ONLY by td/th (rowspan/colspan) and html
        # (lang) — see _span_attr and _find_meta; skipping the findall+
        # dictcomp for every other tag cut ~15% off the tree build
        # (profiled: 105k findall calls for 5k docs, nearly all unread)
        if attrs_s and tag in _ATTR_TAGS \
                and ("=" in attrs_s or attrs_s.strip()):
            node.attrs = {
                k.lower(): (v or "").strip("\"'")
                for k, v in _ATTR_RE.findall(attrs_s)
                if k
            }
        else:
            node.attrs = _EMPTY_ATTRS
        children.append(node)
        if selfclose or tag in _VOID:
            continue
        if tag in _RAWTEXT:
            cm = _RAW_CLOSE[tag].search(html_str, pos)
            if cm is None:
                break  # unterminated raw text: drop the rest
            # raw text content intentionally not added (drop_tags anyway)
            gt = html_str.find(">", cm.start())
            pos = n if gt < 0 else gt + 1
            continue
        stack.append(node)
        children = node.children
    return root


def _texts(node: _Node, in_anchor: bool,
           out: list[tuple[str, bool]],
           enter_blocks: bool = False) -> None:
    """Collect (text, is_link_text) pairs below ``node``, skipping
    dropped subtrees and — by default — nested block elements (those
    form their own candidate blocks). ``enter_blocks=True`` descends
    into them too: table CELLS use it, because ``<td><p>text</p></td>``
    is everyday markup and the cell's paragraph never becomes a
    standalone block (_walk_blocks doesn't recurse into tables)."""
    for ch in node.children:
        if type(ch) is str:  # text run
            out.append((ch, in_anchor))
        elif ch.tag in HTML.drop_tags:
            continue
        elif ch.tag in HTML.block_tags and not enter_blocks:
            continue  # handled as its own block
        else:
            _texts(ch, in_anchor or ch.tag == "a", out, enter_blocks)


def _span_attr(node: _Node, name: str) -> int:
    try:
        v = int((node.attrs or {}).get(name, "1") or 1)
    except (TypeError, ValueError):
        return 1
    return max(1, min(v, 1000))


def _table_to_ascii(table_node: _Node) -> str:
    """HTML <table> -> the SAME TableIR -> ASCII pipeline the PDF path
    uses (render/ascii_table T4), so tables from both source formats
    render with identical bytes. Header detection: <th> cells or a
    <thead> row. rowspan/colspan attributes place cells into the grid
    with standard HTML occupancy rules; the shared renderer expands
    merged cells via the rowspan-aware TableIR.get_cell (reference
    output/models.py:263-283), repeating the text in covered slots."""
    from ..layout.ir import BBox, CellIR, TableIR
    from ..render import ascii_table

    rows: list[list[tuple[str, str, int, int]]] = []  # (tag, text, rs, cs)

    def find_rows(n: _Node) -> None:
        for ch in n.children:
            if type(ch) is str:
                continue
            if ch.tag == "tr":
                cells: list[tuple[str, str, int, int]] = []
                for cc in ch.children:
                    if type(cc) is str:
                        continue
                    if cc.tag in ("td", "th"):
                        pieces: list[tuple[str, bool]] = []
                        _texts(cc, False, pieces, enter_blocks=True)
                        txt = _WS_RE.sub(
                            " ", "".join(p for p, _ in pieces)).strip()
                        cells.append((cc.tag, txt,
                                      _span_attr(cc, "rowspan"),
                                      _span_attr(cc, "colspan")))
                if cells:
                    rows.append(cells)
            elif ch.tag in ("thead", "tbody", "tfoot"):
                find_rows(ch)

    find_rows(table_node)
    if len(rows) < 2:
        return ""
    # grid placement with occupancy (rowspan pushes later rows' cells right)
    occupied: set[tuple[int, int]] = set()
    cells: list[CellIR] = []
    num_rows = len(rows)
    num_cols = 0
    header_tags: list[str] = []
    for ri, row in enumerate(rows):
        ci = 0
        for tag, txt, rs, cs in row:
            while (ri, ci) in occupied:
                ci += 1
            for r in range(ri, ri + rs):
                for c in range(ci, ci + cs):
                    occupied.add((r, c))
            cells.append(CellIR(
                text=txt, bbox=BBox(ci, ri, ci + cs, ri + rs),
                row=ri, col=ci, rowspan=rs, colspan=cs,
                is_header=(ri == 0)))
            if ri == 0:
                header_tags.append(tag)
            num_rows = max(num_rows, ri + rs)
            num_cols = max(num_cols, ci + cs)
            ci += cs
    if num_cols < 2:
        return ""
    has_header = bool(header_tags) and all(t == "th" for t in header_tags)
    t = TableIR(cells=cells, bbox=BBox(0, 0, num_cols, num_rows),
                num_rows=num_rows, num_cols=num_cols,
                has_header=has_header)
    return ascii_table.convert(t)


def _walk_blocks(node: _Node, out: list[tuple[str, str, float]],
                 in_anchor: bool = False) -> None:
    """Emit (tag, text, link_density) for each block element that has
    direct inline content; recurse into nested blocks in document order.
    <table> elements are rendered whole (ASCII) and not recursed.
    ``in_anchor`` tracks block elements nested INSIDE <a> (link menus
    structured as <a><div>..</div></a>) so their text counts as linky."""
    for ch in node.children:
        if type(ch) is str:  # bare text run outside any block
            continue
        if ch.tag in HTML.drop_tags:
            continue
        if ch.tag == "table":
            ascii_repr = _table_to_ascii(ch)
            if ascii_repr:
                out.append(("table", ascii_repr, 0.0))
                continue
            # degenerate table: fall through to plain text handling
        if ch.tag not in HTML.block_tags:
            _walk_blocks(ch, out, in_anchor or ch.tag == "a")
            continue
        pieces: list[tuple[str, bool]] = []
        _texts(ch, in_anchor, pieces)
        raw = "".join(p for p, _ in pieces)
        if ch.tag == "pre":
            # preformatted: internal whitespace/newlines are content
            text = raw.strip("\n").rstrip()
        else:
            text = _WS_RE.sub(" ", raw).strip()
        if text:
            # one cleaning pass per piece (the old code re-ran the
            # whitespace sub over anchor pieces a second time)
            total = 0
            linky = 0
            for p, a in pieces:
                ln = len(_WS_RE.sub(" ", p).strip())
                total += ln
                if a:
                    linky += ln
            density = linky / total if total else 0.0
            out.append((ch.tag, text, density))
        _walk_blocks(ch, out, in_anchor)


_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_.:-]+)", re.I)


def sniff_charset(data: bytes) -> str:
    """BOM + meta-charset detection (WHATWG encoding-sniffing spirit):
    UTF-8/16/32 BOMs win; otherwise the first <meta charset=...> or
    http-equiv content charset within the head prefix; utf-8 fallback."""
    if data[:4] in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"):
        return "utf-32"
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if data[:2] == b"\xff\xfe" or data[:2] == b"\xfe\xff":
        return "utf-16"
    m = _META_CHARSET_RE.search(data[:2048])
    if m:
        import codecs

        enc = m.group(1).decode("ascii", "replace").lower()
        try:
            codecs.lookup(enc)
            return enc
        except LookupError:
            pass
    return "utf-8"


def extract_html(data: bytes, fast: bool = True) -> dict:
    """Extract main content. Returns {text, title, lang, n_blocks,
    dropped_blocks}. ``fast=False`` uses the stdlib html.parser tree
    builder (reference implementation for A/B tests). Bytes are decoded
    per BOM / meta-charset sniffing (Common-Crawl pages are far from
    uniformly utf-8), errors replaced — never raised."""
    html_str = data.decode(sniff_charset(data), "replace")
    if fast:
        root = _fast_tree(html_str)
    else:
        builder = _TreeBuilder()
        builder.feed(html_str)
        builder.close()
        root = builder.root

    title = ""
    lang = ""

    def _find_meta(n: _Node) -> None:
        nonlocal title, lang
        for ch in n.children:
            if type(ch) is str:
                continue
            if ch.tag == "title" and not title:
                title = _WS_RE.sub(
                    " ", "".join(c for c in ch.children
                                 if type(c) is str)).strip()
            if ch.tag == "html" and not lang:
                # FIRST html element's lang wins (the document root —
                # matches reading the root attribute; also what makes
                # the early exit below semantics-preserving)
                lang = (ch.attrs or {}).get("lang", "")
            if title and lang:
                return  # both live near the top; stop walking the body
            _find_meta(ch)

    _find_meta(root)

    blocks: list[tuple[str, str, float]] = []
    _walk_blocks(root, blocks)

    kept: list[str] = []
    dropped = 0
    for tag, text, density in blocks:
        is_heading = tag in _HEADINGS
        long_enough = len(text) >= HTML.min_block_chars
        if density > HTML.max_link_density:
            dropped += 1
            continue
        # short blocks survive only when entirely link-free (headings,
        # trailing sentence fragments); short linky blocks are menus
        if not (long_enough or is_heading or density == 0.0):
            dropped += 1
            continue
        kept.append(text)

    return {
        "text": "\n".join(kept),
        "title": title,
        "lang": lang,
        "n_blocks": len(kept),
        "dropped_blocks": dropped,
    }
