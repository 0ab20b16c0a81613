"""Per-page layout analysis orchestration.

Re-implements reference layout/analyzer.py:89-300 — the 6-step pipeline:
raw blocks -> header/footer split (P4) -> table extraction + spatial
anti-join (P10) -> column detection (C3/C4) -> paragraph reconstruction
(A4/A5) -> reading-order sort (O3). Error ladder mirrors the reference's
component-level degradation (E2/E3).
"""

from __future__ import annotations

from ..config import LAYOUT
from ..pdf.tokenizer import PdfPage, Span
from ..render import ascii_table
from . import columns as columns_mod
from . import paragraphs as paragraphs_mod
from . import tables as tables_mod
from .ir import (
    BBox, BlockIR, ColumnIR, PageIR, SpanIR, TableIR, TextBlockIR,
    union_bbox,
)
from .lines import extract_raw_blocks, simple_text
from .page_ops import assign_blocks_to_columns


def to_span_ir(s: Span) -> SpanIR:
    """Adapter: tokenizer's flat Span -> layout SpanIR."""
    return SpanIR(text=s.text, bbox=BBox(s.x0, s.y0, s.x1, s.y1),
                  font=s.font, size=s.size, bold=s.bold, italic=s.italic,
                  color=s.color)


def analyze_page(page: PdfPage, text_tables: bool = False) -> PageIR:
    """Reference analyzer.py:89-180. ``text_tables=True`` additionally
    runs the whitespace-lattice detector when no ruled table is found
    (extension beyond the reference; default off for output parity)."""
    spans_ir = [to_span_ir(s) for s in page.spans]
    # Step 1: raw blocks with page-level column assignment (page.py:96-118)
    raw = extract_raw_blocks(spans_ir)
    if raw:
        raw = assign_blocks_to_columns(raw, page.width / 2)

    if not raw:
        return PageIR(page_number=page.number, width=page.width,
                      height=page.height)

    # Step 2: header/footer (P4, analyzer.py:182-216)
    header, footer, content = _separate_header_footer(raw, page.height)

    # Step 3: tables + anti-join (analyzer.py:218-268)
    tables, content = _extract_tables(page, content)
    if text_tables and not tables:
        try:
            # detect over PRE-column-split raw lines (wide table rows get
            # split by the boundary logic otherwise), like pdfplumber's
            # word-based strategy. NOT equivalent to bare
            # spans_to_lines: the block pass also (y0,x0)-sorts and
            # drops lines living in empty-only blocks (P2) — the
            # detector must see the same line set the text path uses.
            raw_lines = [ln for b in extract_raw_blocks(spans_ir)
                         for ln in b.lines]
            cand = tables_mod.detect_text_tables(raw_lines, page.height)
        except Exception:
            cand = []  # E3 degradation, same as ruled path
        if cand:
            for t in cand:
                t.ascii_representation = ascii_table.convert(t)
            tables = cand
            # extension path: anti-join in a CONSISTENT frame (unflip the
            # table bbox back to top-left) — the reference's mixed-frame
            # quirk applies only to the parity-bound ruled path
            tboxes = [BBox(t.bbox.x0, page.height - t.bbox.y1,
                           t.bbox.x1, page.height - t.bbox.y0)
                      for t in cand]
            content = [b for b in content
                       if not any(b.bbox.intersects(tb) for tb in tboxes)]

    # Step 4: columns (analyzer.py:127-135 w/ E3 degradation)
    try:
        cols = columns_mod.detect_columns(content, page.width)
    except Exception:
        cols = []

    # Step 5: paragraphs per column (analyzer.py:137-166)
    text_blocks: list[TextBlockIR] = []
    structured_cols: list[ColumnIR] = []
    if cols:
        for col in cols:
            cb = paragraphs_mod.reconstruct(col["blocks"], col["index"])
            text_blocks.extend(cb)
            structured_cols.append(
                ColumnIR(bbox=col["bbox"], index=col["index"], blocks=cb))
    else:
        text_blocks = paragraphs_mod.reconstruct(content, 0)
        if text_blocks:
            structured_cols.append(ColumnIR(
                bbox=union_bbox([b.bbox for b in text_blocks]),
                index=0, blocks=text_blocks))

    # Step 6: reading order (O3, analyzer.py:282-300 — note the -y1 sort,
    # bottom-to-top within a column on top-left data; replicated as-is)
    sorted_blocks = _sort_reading_order(text_blocks, structured_cols)

    return PageIR(
        page_number=page.number,
        width=page.width,
        height=page.height,
        blocks=sorted_blocks,
        tables=tables,
        columns=structured_cols,
        header=header,
        footer=footer,
    )


def _separate_header_footer(
    blocks: list[BlockIR], page_height: float
) -> tuple[str, str, list[BlockIR]]:
    """P4 (reference analyzer.py:182-216), top-left-origin logic."""
    hdr: list[BlockIR] = []
    ftr: list[BlockIR] = []
    content: list[BlockIR] = []
    ht = LAYOUT.header_margin
    ft = page_height - LAYOUT.footer_margin
    for b in blocks:
        if b.bbox.y1 < ht:
            hdr.append(b)
        elif b.bbox.y0 > ft:
            ftr.append(b)
        else:
            content.append(b)
    header = " ".join(b.text for b in hdr).strip()
    footer = " ".join(b.text for b in ftr).strip()
    return header, footer, content


def _extract_tables(
    page: PdfPage, blocks: list[BlockIR]
) -> tuple[list[TableIR], list[BlockIR]]:
    """T1-T4 + P10 anti-join (reference analyzer.py:218-268). Table
    bboxes are in the flipped frame while block bboxes are top-left —
    the intersection test crosses frames (documented quirk, SURVEY §1.4)."""
    try:
        tables = tables_mod.detect_tables(
            page.segments, [to_span_ir(s) for s in page.spans], page.height)
    except Exception:
        return [], blocks  # E3 (analyzer.py:229-239)
    if not tables:
        return [], blocks

    final: list[TableIR] = []
    tboxes: list[BBox] = []
    for t in tables:
        t.ascii_representation = ascii_table.convert(t)
        final.append(t)
        tboxes.append(t.bbox)

    filtered = [
        b for b in blocks
        if not any(b.bbox.intersects(tb) for tb in tboxes)
    ]
    return final, filtered


def _sort_reading_order(blocks: list[TextBlockIR],
                        cols: list[ColumnIR]) -> list[TextBlockIR]:
    """O3 (reference analyzer.py:282-300)."""
    if not blocks:
        return []
    if len(cols) <= 1:
        return sorted(blocks, key=lambda b: -b.bbox.y1)
    return sorted(blocks, key=lambda b: (b.column_index, -b.bbox.y1))


def fallback_page(page: PdfPage) -> PageIR:
    """E2 (reference document.py:291-321): whole-page simple text as one
    PARAGRAPH block spanning the page; empty text -> zero blocks."""
    from .ir import PARAGRAPH

    text = ""
    try:
        text = simple_text([to_span_ir(s) for s in page.spans])
    except Exception:
        text = ""
    blocks: list[TextBlockIR] = []
    if text.strip():
        blocks = [TextBlockIR(
            text=text,
            bbox=BBox(0.0, 0.0, page.width, page.height),
            block_type=PARAGRAPH,
        )]
    return PageIR(page_number=page.number, width=page.width,
                  height=page.height, blocks=blocks)
