"""Page-level block operations: column assignment, wide-block split, and
adjacency merges.

Re-implements reference core/page.py:159-470 (operators C1/C2, A2/A3,
P7/P8 in SURVEY.md §2) with identical thresholds and ordering semantics.
"""

from __future__ import annotations

from ..config import LAYOUT
from .ir import BBox, BlockIR, LineIR, SpanIR, union_bbox
from .lines import _vertically_overlaps


def assign_blocks_to_columns(blocks: list[BlockIR],
                             boundary: float) -> list[BlockIR]:
    """C1 (reference page.py:159-211): bucket blocks into center/left/right
    around ``boundary`` (= page width / 2, page.py:115-117), split wide
    blocks that carry spans on both sides, sort each bucket by y0, merge
    horizontally-aligned blocks, and return center + left + right."""
    center: list[BlockIR] = []
    left: list[BlockIR] = []
    right: list[BlockIR] = []

    for b in blocks:
        cx = (b.bbox.x0 + b.bbox.x1) / 2
        if (b.bbox.x0 < boundary - LAYOUT.wide_band
                and b.bbox.x1 > boundary + LAYOUT.wide_band):
            if _should_split_block(b, boundary):
                lp, rp = _split_block_at_boundary(b, boundary)
                if lp:
                    left.append(lp)
                if rp:
                    right.append(rp)
            else:
                center.append(b)
        elif cx < boundary:
            left.append(b)
        else:
            right.append(b)

    # top-to-bottom within each bucket (page.py:199-203)
    center.sort(key=lambda b: b.bbox.y0)
    left.sort(key=lambda b: b.bbox.y0)
    right.sort(key=lambda b: b.bbox.y0)

    center = merge_column_blocks(center)
    left = merge_column_blocks(left)
    right = merge_column_blocks(right)
    return center + left + right


def _should_split_block(block: BlockIR, boundary: float) -> bool:
    """P8 (reference page.py:361-391): 1-line blocks centered within 50pt
    stay whole; otherwise split iff spans exist on both sides."""
    if len(block.lines) <= 1:
        cx = (block.bbox.x0 + block.bbox.x1) / 2
        if abs(cx - boundary) < LAYOUT.center_keep_dist:
            return False
    has_left = has_right = False
    for s in block.spans:
        if (s.bbox.x0 + s.bbox.x1) / 2 < boundary:
            has_left = True
        else:
            has_right = True
        if has_left and has_right:
            return True
    return False


def _split_block_at_boundary(
    block: BlockIR, boundary: float
) -> tuple[BlockIR | None, BlockIR | None]:
    """C2 (reference page.py:393-470): span-level split. NB the rebuilt
    line text is an UNCONDITIONAL single-space join of span texts
    (page.py:420, 434) — deliberately different from A1's gap rule."""
    left_lines: list[LineIR] = []
    right_lines: list[LineIR] = []

    for ln in block.lines:
        ls = [s for s in ln.spans
              if (s.bbox.x0 + s.bbox.x1) / 2 < boundary]
        rs = [s for s in ln.spans
              if (s.bbox.x0 + s.bbox.x1) / 2 >= boundary]
        if ls:
            left_lines.append(LineIR(
                bbox=BBox(min(s.bbox.x0 for s in ls), ln.bbox.y0,
                          max(s.bbox.x1 for s in ls), ln.bbox.y1),
                text=" ".join(s.text for s in ls),
                spans=ls,
            ))
        if rs:
            right_lines.append(LineIR(
                bbox=BBox(min(s.bbox.x0 for s in rs), ln.bbox.y0,
                          max(s.bbox.x1 for s in rs), ln.bbox.y1),
                text=" ".join(s.text for s in rs),
                spans=rs,
            ))

    def _block(lines: list[LineIR]) -> BlockIR | None:
        if not lines:
            return None
        spans = [s for ln in lines for s in ln.spans]
        return BlockIR(bbox=union_bbox([ln.bbox for ln in lines]),
                       lines=lines, spans=spans)

    return _block(left_lines), _block(right_lines)


def merge_column_blocks(blocks: list[BlockIR]) -> list[BlockIR]:
    """A3 (reference page.py:237-276): re-merge each block's internal
    lines, then group-adjacent blocks that vertically overlap and merge
    each group. This is the op that reconstitutes split table rows."""
    if not blocks:
        return []

    processed: list[BlockIR] = []
    for b in blocks:
        if len(b.lines) > 1:
            merged_lines = merge_lines(list(b.lines))
            if len(merged_lines) < len(b.lines):
                b = BlockIR(bbox=b.bbox, lines=merged_lines, spans=b.spans)
        processed.append(b)

    merged: list[BlockIR] = []
    group: list[BlockIR] = [processed[0]]
    for b in processed[1:]:
        if _vertically_overlaps(group[-1].bbox, b.bbox):
            group.append(b)
        else:
            merged.append(group[0] if len(group) == 1
                          else _merge_raw_blocks(group))
            group = [b]
    merged.append(group[0] if len(group) == 1 else _merge_raw_blocks(group))
    return merged


def _merge_raw_blocks(blocks: list[BlockIR]) -> BlockIR:
    """Reference page.py:278-302: sort left-to-right, union bbox, re-merge
    lines, spans collected from merged lines."""
    blocks.sort(key=lambda b: b.bbox.x0)
    bbox = union_bbox([b.bbox for b in blocks])
    all_lines: list[LineIR] = []
    for b in blocks:
        all_lines.extend(b.lines)
    merged_lines = merge_lines(all_lines)
    spans: list[SpanIR] = []
    for ln in merged_lines:
        spans.extend(ln.spans)
    return BlockIR(bbox=bbox, lines=merged_lines, spans=spans)


def merge_lines(lines: list[LineIR]) -> list[LineIR]:
    """A2 (reference page.py:304-324): sort by y0, group-adjacent by the
    vertical-overlap predicate, merge each group left-to-right."""
    if not lines:
        return []
    lines.sort(key=lambda ln: ln.bbox.y0)
    result: list[LineIR] = []
    group: list[LineIR] = [lines[0]]
    for ln in lines[1:]:
        if _vertically_overlaps(group[-1].bbox, ln.bbox):
            group.append(ln)
        else:
            result.append(_create_merged_line(group))
            group = [ln]
    result.append(_create_merged_line(group))
    return result


def _create_merged_line(lines: list[LineIR]) -> LineIR:
    """Reference page.py:326-359: left-to-right join inserting " " iff the
    x-gap between segments exceeds 5pt."""
    if len(lines) == 1:
        return lines[0]
    lines.sort(key=lambda ln: ln.bbox.x0)
    bbox = union_bbox([ln.bbox for ln in lines])
    spans: list[SpanIR] = []
    parts: list[str] = []
    last_x: float | None = None
    for ln in lines:
        spans.extend(ln.spans)
        if last_x is not None and ln.bbox.x0 - last_x > LAYOUT.line_merge_gap:
            parts.append(" ")
        parts.append(ln.text)
        last_x = ln.bbox.x1
    return LineIR(bbox=bbox, text="".join(parts), spans=spans)
