"""Paragraph reconstruction (A4/A5) + block classification (F3/F4).

Re-implements reference layout/paragraphs.py:30-398. Note the documented
coordinate quirk (SURVEY.md §1.4): ``_should_merge`` computes
``vertical_gap = prev.y0 - curr.y1`` — a bottom-left-origin formula applied
to top-left data — so for stacked non-overlapping blocks the gap is
negative and the merge almost never fires. This is replicated AS-IS; real
merging happened earlier in page_ops.merge_column_blocks.
"""

from __future__ import annotations

import re

from ..config import LAYOUT
from .ir import (
    HEADING, JUSTIFY, LEFT, LIST_ITEM, PARAGRAPH, RIGHT, UNKNOWN,
    BlockIR, SpanIR, TextBlockIR, union_bbox,
)

_LIST_RE = re.compile(r"^[\•\-\*\d]+[\.\)]\s")  # reference paragraphs.py:319


def reconstruct(blocks: list[BlockIR], column_index: int = 0
                ) -> list[TextBlockIR]:
    """Reference paragraphs.py:56-109: sort by y0 asc, sequential
    group-adjacent via _should_merge, fold each group to a TextBlock."""
    if not blocks:
        return []
    sorted_blocks = sorted(blocks, key=lambda b: b.bbox.y0)
    groups: list[list[BlockIR]] = []
    cur: list[BlockIR] = []
    for b in sorted_blocks:
        if not cur:
            cur.append(b)
            continue
        if _should_merge(cur[-1], b):
            cur.append(b)
        else:
            groups.append(cur)
            cur = [b]
    if cur:
        groups.append(cur)

    out: list[TextBlockIR] = []
    for g in groups:
        tb = _create_text_block(g, column_index)
        if tb:
            out.append(tb)
    return out


def _should_merge(prev: BlockIR, curr: BlockIR) -> bool:
    """Reference paragraphs.py:111-161 (incl. the y-frame quirk)."""
    if prev.bbox.horizontal_overlap(curr.bbox) < LAYOUT.para_h_overlap:
        return False
    pw, cw = prev.bbox.width, curr.bbox.width
    if pw > 0 and cw > 0:
        if min(pw, cw) / max(pw, cw) < LAYOUT.para_width_ratio:
            return False
    vertical_gap = prev.bbox.y0 - curr.bbox.y1  # quirk: bottom-left formula
    avg = _estimate_font_size(prev)
    if vertical_gap > avg * LAYOUT.para_gap_factor or vertical_gap < 0:
        return False
    if abs(prev.bbox.x0 - curr.bbox.x0) > avg * LAYOUT.para_indent_factor:
        return False
    return True


def _estimate_font_size(block: BlockIR) -> float:
    """Reference paragraphs.py:163-173."""
    sizes = [s.size for s in block.spans if s.size > 0]
    return sum(sizes) / len(sizes) if sizes else LAYOUT.default_font_size


def _create_text_block(blocks: list[BlockIR],
                       column_index: int) -> TextBlockIR | None:
    """Reference paragraphs.py:175-231."""
    if not blocks:
        return None
    spans: list[SpanIR] = []
    for b in blocks:
        spans.extend(b.spans)
    if not spans:
        return None
    bbox = union_bbox([b.bbox for b in blocks])
    text = _reconstruct_text(blocks)
    if not text.strip():
        return None
    block_type = classify_block(blocks, spans)
    alignment = _detect_alignment(blocks, bbox)
    indentation = blocks[0].bbox.x0 - bbox.x0 if len(blocks) > 1 else 0.0
    return TextBlockIR(
        text=text,
        bbox=bbox,
        block_type=block_type,
        spans=spans,
        alignment=alignment,
        indentation=max(0.0, indentation),
        line_spacing=_line_spacing(blocks),
        column_index=column_index,
    )


def _reconstruct_text(blocks: list[BlockIR]) -> str:
    """A5 hyphen-repair join (reference paragraphs.py:245-283): previous
    piece ending '-' -> drop hyphen, no space; else join with ' '."""
    texts = [b.text.strip() for b in blocks if b.text.strip()]
    if not texts:
        return ""
    parts: list[str] = []
    for i, t in enumerate(texts):
        if i == 0:
            parts.append(t)
            continue
        prev = parts[-1] if parts else ""
        if prev.endswith("-"):
            parts[-1] = prev[:-1]
            parts.append(t)
        else:
            parts.append(" " + t)
    return "".join(parts)


def classify_block(blocks: list[BlockIR], spans: list[SpanIR]) -> str:
    """F3/F4 (reference paragraphs.py:285-323): heading iff <100 chars AND
    (bold OR avg size >= 14 OR (isupper AND len > 3)); list-item regex."""
    if not spans:
        return UNKNOWN
    avg_size = sum(s.size for s in spans) / len(spans)
    any_bold = any(s.bold for s in spans)
    full_text = " ".join(b.text for b in blocks).strip()
    is_short = len(full_text) < LAYOUT.heading_max_chars
    is_all_caps = (full_text.isupper()
                   and len(full_text) > LAYOUT.heading_caps_min_len)
    has_large = avg_size >= LAYOUT.heading_min_size
    if is_short and (any_bold or has_large or is_all_caps):
        return HEADING
    if _LIST_RE.match(full_text):
        return LIST_ITEM
    return PARAGRAPH


def _detect_alignment(blocks: list[BlockIR], container) -> str:
    """Reference paragraphs.py:325-362 (stddev of margins < 5pt)."""
    if len(blocks) < 2:
        return LEFT
    lm = [b.bbox.x0 - container.x0 for b in blocks]
    rm = [container.x1 - b.bbox.x1 for b in blocks]
    lv, rv = _stddev(lm), _stddev(rm)
    la, ra = lv < 5.0, rv < 5.0
    if la and ra:
        return JUSTIFY
    if ra:
        return RIGHT
    return LEFT


def _stddev(vals: list[float]) -> float:
    """Reference paragraphs.py:364-372 (population stddev, named
    'variance' there)."""
    if len(vals) < 2:
        return 0.0
    mean = sum(vals) / len(vals)
    return (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5


def _line_spacing(blocks: list[BlockIR]) -> float:
    """Reference paragraphs.py:374-398: mean positive gap over blocks
    sorted by -y1."""
    if len(blocks) < 2:
        return 0.0
    sb = sorted(blocks, key=lambda b: -b.bbox.y1)
    gaps = []
    for i in range(len(sb) - 1):
        sp = sb[i].bbox.y0 - sb[i + 1].bbox.y1
        if sp > 0:
            gaps.append(sp)
    return sum(gaps) / len(gaps) if gaps else 0.0
