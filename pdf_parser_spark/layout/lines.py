"""Span -> raw-line -> raw-block assembly.

The reference consumed PyMuPDF's pre-grouped dict (core/page.py:472-531);
our tokenizer emits flat spans, so this module reconstructs the same
structure deterministically:

* spans -> lines: group spans that vertically overlap (the reference's own
  adjacency predicate P7, core/page.py:213-235), sort left-to-right, and
  apply the reference's space-inference rule A1 (core/page.py:677-691:
  insert " " iff x-gap > prev_font_size * 0.3, then strip).
* lines -> blocks: consecutive lines (sorted by top y) join one block iff
  the vertical gap is under BLOCK_GAP_FACTOR x font size and their x-ranges
  overlap — the deterministic stand-in for PyMuPDF's internal block
  grouping (which the reference treated as given).
"""

from __future__ import annotations

import numpy as np

from ..config import LAYOUT
from .ir import BBox, BlockIR, LineIR, SpanIR, union_bbox

# Lines whose inter-line gap is below this fraction of the previous line's
# font size belong to the same raw block. With our writer's metrics
# (line height ~0.92 x size) this puts single/1.5-spaced text in one block
# and double-spaced paragraph breaks in separate blocks.
BLOCK_GAP_FACTOR = 0.8


def _vertically_overlaps(a: BBox, b: BBox) -> bool:
    """Reference core/page.py:213-235: overlap > 20% of the smaller
    height, or centers within 5pt."""
    overlap = min(a.y1, b.y1) - max(a.y0, b.y0)
    min_h = min(a.y1 - a.y0, b.y1 - b.y0)
    if min_h <= 0:
        return False
    if overlap > min_h * LAYOUT.v_overlap_frac:
        return True
    return abs((a.y0 + a.y1) / 2 - (b.y0 + b.y1) / 2) < LAYOUT.v_center_dist


def spans_to_lines(spans: list[SpanIR]) -> list[LineIR]:
    """Group spans into lines and build line text with space inference."""
    if not spans:
        return []
    # Sort by vertical position, then x (numpy argsort keeps this O(n log n)
    # with float keys; span counts per page are small but pages per batch
    # are many).
    y0 = np.fromiter((s.bbox.y0 for s in spans), dtype=np.float64)
    x0 = np.fromiter((s.bbox.x0 for s in spans), dtype=np.float64)
    order = np.lexsort((x0, y0))

    # r6: the running group bbox lives in four locals and the overlap
    # test is inlined — same float expressions as _vertically_overlaps
    # and union_bbox (bit-identical decisions), without a BBox + list
    # allocation per span
    frac = LAYOUT.v_overlap_frac
    cdist = LAYOUT.v_center_dist
    groups: list[list[SpanIR]] = []
    first = spans[order[0]]
    cur: list[SpanIR] = [first]
    fb = first.bbox
    cy0, cy1 = fb.y0, fb.y1
    for idx in order[1:]:
        s = spans[idx]
        sb = s.bbox
        overlap = min(cy1, sb.y1) - max(cy0, sb.y0)
        min_h = min(cy1 - cy0, sb.y1 - sb.y0)
        if min_h > 0 and (
                overlap > min_h * frac
                or abs((cy0 + cy1) / 2 - (sb.y0 + sb.y1) / 2) < cdist):
            cur.append(s)
            if sb.y0 < cy0:
                cy0 = sb.y0
            if sb.y1 > cy1:
                cy1 = sb.y1
        else:
            groups.append(cur)
            cur = [s]
            cy0, cy1 = sb.y0, sb.y1
    groups.append(cur)

    lines: list[LineIR] = []
    for g in groups:
        g.sort(key=lambda s: s.bbox.x0)
        # A1: space inference (reference page.py:664-691)
        parts: list[str] = []
        last_x1: float | None = None
        last_size = 12.0
        kept: list[SpanIR] = []
        for s in g:
            if not s.text:  # P1 empty-span filter (page.py:708-710)
                continue
            kept.append(s)
            if last_x1 is not None:
                gap = s.bbox.x0 - last_x1
                if gap > last_size * LAYOUT.space_threshold:
                    parts.append(" ")
            parts.append(s.text)
            last_x1 = s.bbox.x1
            last_size = s.size
        text = "".join(parts).strip()
        if not text:  # P2 empty-line filter (page.py:691-694)
            continue
        lines.append(LineIR(
            bbox=union_bbox([s.bbox for s in kept]),
            text=text,
            spans=kept,
        ))
    return lines


def lines_to_blocks(lines: list[LineIR]) -> list[BlockIR]:
    """Group consecutive lines into raw blocks by vertical proximity."""
    if not lines:
        return []
    lines = sorted(lines, key=lambda ln: (ln.bbox.y0, ln.bbox.x0))
    blocks: list[BlockIR] = []
    cur: list[LineIR] = [lines[0]]
    for ln in lines[1:]:
        prev = cur[-1]
        gap = ln.bbox.y0 - prev.bbox.y1
        size = prev.spans[0].size if prev.spans else 12.0
        x_overlap = (min(prev.bbox.x1, ln.bbox.x1)
                     - max(prev.bbox.x0, ln.bbox.x0))
        if gap <= size * BLOCK_GAP_FACTOR and x_overlap > 0:
            cur.append(ln)
        else:
            blocks.append(_make_block(cur))
            cur = [ln]
    blocks.append(_make_block(cur))
    # P2: drop blocks with no non-empty lines (page.py:528-529)
    return [b for b in blocks if not b.is_empty]


def _make_block(lines: list[LineIR]) -> BlockIR:
    spans = [s for ln in lines for s in ln.spans]
    return BlockIR(bbox=union_bbox([ln.bbox for ln in lines]),
                   lines=lines, spans=spans)


def extract_raw_blocks(spans: list[SpanIR]) -> list[BlockIR]:
    """PyMuPDF-equivalent of reference ``_extract_blocks_pymupdf``
    (page.py:472-496): spans -> lines -> blocks, empties dropped."""
    return lines_to_blocks(spans_to_lines(spans))


def simple_text(spans: list[SpanIR]) -> str:
    """Fallback extraction, equivalent of PyMuPDF ``get_text("text")``
    used by the reference fallback page (page.py:757-774,
    document.py:291-321): line texts top-to-bottom joined by newline."""
    lines = spans_to_lines(spans)
    lines.sort(key=lambda ln: (ln.bbox.y0, ln.bbox.x0))
    return "\n".join(ln.text for ln in lines)
