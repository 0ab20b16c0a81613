"""Column detection (C3/C4): two-column center split with gap-scan
fallback. Re-implements reference layout/columns.py:38-286 with identical
thresholds (±30pt center band, ≥2 blocks per side, ≥10pt gutter, 50pt
margin, 20pt gap threshold)."""

from __future__ import annotations

from ..config import LAYOUT
from .ir import BBox, BlockIR, ColumnIR


def detect_columns(blocks: list[BlockIR], page_width: float) -> list[dict]:
    """Returns a list of {bbox, index, blocks} dicts (detected columns);
    empty list means single-column layout (reference columns.py:60-99)."""
    if not blocks:
        return []
    two = _detect_two_columns(blocks, page_width)
    if two:
        return two
    gaps = _find_horizontal_gaps(blocks)
    if not gaps:
        return []
    cols = _create_columns_from_gaps(gaps, blocks, page_width)
    if len(cols) <= 1:
        return []
    return cols


def _detect_two_columns(blocks: list[BlockIR],
                        page_width: float) -> list[dict] | None:
    """Reference columns.py:101-191."""
    if len(blocks) < LAYOUT.min_blocks_two_col:
        return None
    center = page_width / 2
    margin = LAYOUT.column_margin

    left: list[BlockIR] = []
    right: list[BlockIR] = []
    spanning: list[BlockIR] = []
    for b in blocks:
        bc = (b.bbox.x0 + b.bbox.x1) / 2
        if (b.bbox.x0 < center - LAYOUT.col_center_band
                and b.bbox.x1 > center + LAYOUT.col_center_band):
            spanning.append(b)
        elif bc < center:
            left.append(b)
        else:
            right.append(b)

    if len(left) < LAYOUT.min_blocks_per_side \
            or len(right) < LAYOUT.min_blocks_per_side:
        return None

    left_max_x = max(b.bbox.x1 for b in left)
    right_min_x = min(b.bbox.x0 for b in right)
    if right_min_x - left_max_x < LAYOUT.min_column_gap:
        return None

    cols: list[dict] = []
    ys = [b.bbox.y0 for b in left] + [b.bbox.y1 for b in left]
    cols.append({
        "bbox": BBox(margin, min(ys),
                     center - LAYOUT.gap_threshold / 2, max(ys)),
        "index": 0,
        "blocks": left,
    })
    ys = [b.bbox.y0 for b in right] + [b.bbox.y1 for b in right]
    cols.append({
        "bbox": BBox(center + LAYOUT.gap_threshold / 2, min(ys),
                     page_width - margin, max(ys)),
        "index": 1,
        "blocks": right,
    })
    # center-spanning blocks (titles) PREPENDED to column 0
    # (reference columns.py:186-189)
    if spanning:
        cols[0]["blocks"] = spanning + cols[0]["blocks"]
    return cols


def _find_horizontal_gaps(blocks: list[BlockIR]) -> list[tuple[float, float]]:
    """Reference columns.py:193-234: project block x-intervals, merge
    intervals within gap_threshold, emit gaps >= gap_threshold."""
    cov = sorted((b.bbox.x0, b.bbox.x1) for b in blocks)
    merged: list[tuple[float, float]] = []
    for start, end in cov:
        if merged and start <= merged[-1][1] + LAYOUT.gap_threshold:
            merged[-1] = (merged[-1][0], max(merged[-1][1], end))
        else:
            merged.append((start, end))
    gaps: list[tuple[float, float]] = []
    for i in range(len(merged) - 1):
        g0, g1 = merged[i][1], merged[i + 1][0]
        if g1 - g0 >= LAYOUT.gap_threshold:
            gaps.append((g0, g1))
    return gaps


def _create_columns_from_gaps(gaps: list[tuple[float, float]],
                              blocks: list[BlockIR],
                              page_width: float) -> list[dict]:
    """Reference columns.py:236-286: boundaries [0,g1],[g1,g2],...,[gN,W];
    blocks assigned by center-x."""
    bounds: list[tuple[float, float]] = [(0.0, gaps[0][0])]
    for i in range(len(gaps) - 1):
        bounds.append((gaps[i][1], gaps[i + 1][0]))
    bounds.append((gaps[-1][1], page_width))

    cols: list[dict] = []
    for idx, (lo, hi) in enumerate(bounds):
        members = [b for b in blocks
                   if lo <= (b.bbox.x0 + b.bbox.x1) / 2 <= hi]
        if members:
            ys = [v for b in members for v in (b.bbox.y0, b.bbox.y1)]
            cols.append({
                "bbox": BBox(lo, min(ys), hi, max(ys)),
                "index": idx,
                "blocks": members,
            })
    return cols


__all__ = ["detect_columns", "ColumnIR"]
