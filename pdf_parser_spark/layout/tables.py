"""Ruled-line table detection (T1-T3, A7, P9).

Re-implements the reference's pdfplumber "lines"-strategy lattice detection
(reference tables/detector.py:119-163 configured vertical/horizontal
strategy="lines", snap_tolerance=3) from scratch over the tokenizer's path
segments: snap & cluster rule coordinates, build the cell lattice, fill
cells with span text, then convert exactly like the reference
(detector.py:183-296): y-FLIP to bottom-left frame, uniform-grid cell
bboxes, header detection (detector.py:298-350) and validation
(detector.py:352-379).
"""

from __future__ import annotations

import re

from ..config import TABLES
from .ir import LEFT, BBox, CellIR, SpanIR, TableIR
from ..pdf.tokenizer import Segment

_NUM_RE = re.compile(r"\d+\.?\d*")  # reference detector.py:337


def detect_tables(segments: list[Segment], spans: list[SpanIR],
                  page_height: float) -> list[TableIR]:
    """Full T1->T3 pipeline. Returns validated tables with bboxes in the
    FLIPPED (bottom-left) frame, exactly like the reference.

    Merged-cell inference (beyond-parity: the reference MODELS
    rowspan/colspan, output/models.py:211-239, but its detector never
    emits them): an interior grid edge with no covering rule merges its
    two cells; rectangular merge regions become one CellIR with
    rowspan/colspan through the shared TableIR, which the ASCII/markdown
    renderers and the HTML path already honor. Fully-ruled lattices
    produce only 1x1 regions — byte-identical to the pre-inference
    output."""
    lattices = _find_lattices(segments)
    tables: list[TableIR] = []
    for xs, ys, vs, hs in lattices:
        data = _extract_data(xs, ys, spans)
        regions = _merged_regions(xs, ys, vs, hs)
        t = _convert(data, xs, ys, page_height, regions)
        if t and _validate(t):
            tables.append(t)
    return tables


def _snap(values: list[float], tol: float) -> list[float]:
    """Cluster 1-D coords within ``tol``; return sorted cluster means."""
    if not values:
        return []
    values = sorted(values)
    out: list[list[float]] = [[values[0]]]
    for v in values[1:]:
        if v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(c) / len(c) for c in out]


def _find_lattices(segments: list[Segment]) -> list[tuple[list[float], list[float]]]:
    """Group rule segments into connected components and emit the snapped
    (xs, ys) grid coordinates of each component with >= 2x2 rules."""
    tol = TABLES.snap_tolerance
    verts = [s for s in segments if abs(s.x0 - s.x1) <= tol / 2]
    horiz = [s for s in segments if abs(s.y0 - s.y1) <= tol / 2]
    if not verts or not horiz:
        return []

    segs = verts + horiz
    n = len(segs)
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def touch(a: Segment, b: Segment) -> bool:
        ax0, ax1 = sorted((a.x0, a.x1))
        ay0, ay1 = sorted((a.y0, a.y1))
        bx0, bx1 = sorted((b.x0, b.x1))
        by0, by1 = sorted((b.y0, b.y1))
        return not (ax1 + tol < bx0 or bx1 + tol < ax0
                    or ay1 + tol < by0 or by1 + tol < ay0)

    # spatial-hash the tol-expanded bboxes and compare only bucket
    # cohabitants: all-pairs touch() was O(n^2) in the executor UDF hot
    # path, which a rule-dense page (large ruled grids emit 4 segments
    # per 're') turns into minutes of Python per document. Genuine
    # crossings still pay one check each — that cost IS the lattice.
    cell = max(tol * 8, 16.0)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, s in enumerate(segs):
        x0, x1 = sorted((s.x0, s.x1))
        y0, y1 = sorted((s.y0, s.y1))
        for cx in range(int((x0 - tol) // cell), int((x1 + tol) // cell) + 1):
            for cy in range(int((y0 - tol) // cell),
                            int((y1 + tol) // cell) + 1):
                buckets.setdefault((cx, cy), []).append(i)
    checked: set[tuple[int, int]] = set()
    for members in buckets.values():
        for a in range(len(members)):
            i = members[a]
            for b in range(a + 1, len(members)):
                j = members[b]
                pair = (i, j) if i < j else (j, i)
                if pair in checked:
                    continue
                checked.add(pair)
                if touch(segs[i], segs[j]):
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[ri] = rj

    comps: dict[int, tuple[list[Segment], list[Segment]]] = {}
    for i, s in enumerate(segs):
        r = find(i)
        vs, hs = comps.setdefault(r, ([], []))
        (vs if i < len(verts) else hs).append(s)

    lattices: list[tuple[list[float], list[float],
                         list[Segment], list[Segment]]] = []
    for vs, hs in comps.values():
        xs = _snap([(s.x0 + s.x1) / 2 for s in vs], tol)
        ys = _snap([(s.y0 + s.y1) / 2 for s in hs], tol)
        if len(xs) >= 2 and len(ys) >= 2:
            lattices.append((xs, ys, vs, hs))
    lattices.sort(key=lambda g: (g[1][0], g[0][0]))  # top-to-bottom
    return lattices


def _merge_intervals(iv: list[tuple[float, float]],
                     tol: float) -> list[tuple[float, float]]:
    if not iv:
        return []
    iv = sorted(iv)
    out = [list(iv[0])]
    for lo, hi in iv[1:]:
        if lo <= out[-1][1] + tol:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [(a, b) for a, b in out]


def _rule_coverage(snapped: list[float], segs: list[Segment],
                   vertical: bool, tol: float
                   ) -> dict[float, list[tuple[float, float]]]:
    """For each snapped grid coordinate, the union of intervals (along
    the OTHER axis) actually covered by rules."""
    cov: dict[float, list[tuple[float, float]]] = {v: [] for v in snapped}
    for s in segs:
        c = (s.x0 + s.x1) / 2 if vertical else (s.y0 + s.y1) / 2
        best = min(snapped, key=lambda v: abs(v - c))
        if abs(best - c) <= tol:
            span = sorted((s.y0, s.y1)) if vertical else sorted((s.x0, s.x1))
            cov[best].append((span[0], span[1]))
    return {k: _merge_intervals(v, tol) for k, v in cov.items()}


def _edge_covered(intervals: list[tuple[float, float]], lo: float,
                  hi: float, tol: float) -> bool:
    return any(a <= lo + tol and b >= hi - tol for a, b in intervals)


def _merged_regions(xs: list[float], ys: list[float],
                    vs: list[Segment], hs: list[Segment]
                    ) -> dict[tuple[int, int], tuple[int, int]]:
    """Infer merged cells from MISSING interior rules: two neighbors
    whose shared grid edge no rule covers belong to one region.
    Returns {(row, col) anchor -> (rowspan, colspan)}; every grid cell
    is inside exactly one region (1x1 when fully ruled). Non-rectangular
    merge components degrade to 1x1 cells (E3 semantics — a weird rule
    pattern must not corrupt the grid)."""
    tol = TABLES.snap_tolerance
    nrows, ncols = len(ys) - 1, len(xs) - 1
    vcov = _rule_coverage(xs, vs, True, tol)
    hcov = _rule_coverage(ys, hs, False, tol)

    parent = list(range(nrows * ncols))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for r in range(nrows):
        for c in range(ncols - 1):  # vertical edge between (r,c),(r,c+1)
            if not _edge_covered(vcov[xs[c + 1]], ys[r], ys[r + 1], tol):
                union(r * ncols + c, r * ncols + c + 1)
    for r in range(nrows - 1):      # horizontal edge between rows
        for c in range(ncols):
            if not _edge_covered(hcov[ys[r + 1]], xs[c], xs[c + 1], tol):
                union(r * ncols + c, (r + 1) * ncols + c)

    comps: dict[int, list[tuple[int, int]]] = {}
    for r in range(nrows):
        for c in range(ncols):
            comps.setdefault(find(r * ncols + c), []).append((r, c))

    regions: dict[tuple[int, int], tuple[int, int]] = {}
    for cells in comps.values():
        r0 = min(r for r, _ in cells)
        c0 = min(c for _, c in cells)
        rs = max(r for r, _ in cells) - r0 + 1
        cs = max(c for _, c in cells) - c0 + 1
        if len(cells) == rs * cs:
            regions[(r0, c0)] = (rs, cs)
        else:  # non-rectangular: keep the grid intact
            for r, c in cells:
                regions[(r, c)] = (1, 1)
    return regions


def _extract_data(xs: list[float], ys: list[float],
                  spans: list[SpanIR]) -> list[list[str | None]]:
    """pdfplumber ``table.extract()`` equivalent: matrix of cell texts.
    Cell text = contained span texts (by center point) sorted (y, x),
    space-joined; empty cell -> '' (None only for spanless grids)."""
    nrows, ncols = len(ys) - 1, len(xs) - 1
    buckets: list[list[list[SpanIR]]] = [
        [[] for _ in range(ncols)] for _ in range(nrows)
    ]
    for s in spans:
        cx = (s.bbox.x0 + s.bbox.x1) / 2
        cy = (s.bbox.y0 + s.bbox.y1) / 2
        if not (xs[0] <= cx <= xs[-1] and ys[0] <= cy <= ys[-1]):
            continue
        col = row = None
        for j in range(ncols):
            if xs[j] <= cx <= xs[j + 1]:
                col = j
                break
        for i in range(nrows):
            if ys[i] <= cy <= ys[i + 1]:
                row = i
                break
        if row is not None and col is not None:
            buckets[row][col].append(s)

    data: list[list[str | None]] = []
    for i in range(nrows):
        row: list[str | None] = []
        for j in range(ncols):
            cell = sorted(buckets[i][j], key=lambda s: (s.bbox.y0, s.bbox.x0))
            row.append(" ".join(s.text for s in cell) if cell else "")
        data.append(row)
    return data


def _convert(data: list[list[str | None]], xs: list[float],
             ys: list[float], page_height: float,
             regions: dict[tuple[int, int], tuple[int, int]] | None = None
             ) -> TableIR | None:
    """Reference detector.py:183-296: min_rows gate, y-flip, uniform-grid
    cells, header detection. ``regions`` (anchor -> span) comes from
    merged-cell inference; None means every cell is 1x1."""
    if not data or len(data) < TABLES.min_rows:
        return None
    # top-left-frame bbox of the lattice, flipped like detector.py:208-214
    bbox = BBox(
        x0=xs[0],
        y0=page_height - ys[-1],
        x1=xs[-1],
        y1=page_height - ys[0],
    )
    cells = _cells_from_data(data, bbox, regions)
    if not cells:
        return None
    num_rows = len(data)
    num_cols = max(len(r) for r in data)
    if num_cols < TABLES.min_cols:
        return None
    return TableIR(
        cells=cells,
        bbox=bbox,
        num_rows=num_rows,
        num_cols=num_cols,
        has_header=_detect_header(data),
    )


def _cells_from_data(data: list[list[str | None]], bbox: BBox,
                     regions: dict[tuple[int, int], tuple[int, int]]
                     | None = None) -> list[CellIR]:
    """Reference detector.py:243-296: uniform cell grid computed top-down
    in the FLIPPED frame; None -> ''; is_header = (row == 0). A merged
    region emits ONE CellIR at its anchor whose text is the row-major
    join of its constituent cells' texts and whose bbox covers the
    region (covered cells emit nothing — TableIR.get_cell resolves
    them, reference models.py:263-283)."""
    num_rows = len(data)
    num_cols = max(len(r) for r in data) if data else 0
    if not num_rows or not num_cols:
        return []
    cw = bbox.width / num_cols
    ch = bbox.height / num_rows
    cells: list[CellIR] = []
    for ri, row in enumerate(data):
        for ci, text in enumerate(row):
            if regions is None:
                rs, cs = 1, 1
            elif (ri, ci) in regions:
                rs, cs = regions[(ri, ci)]
            else:
                continue  # covered by another region's anchor
            if rs == 1 and cs == 1:
                cell_text = str(text or "").strip()
            else:
                parts = [str(data[r][c] or "").strip()
                         for r in range(ri, ri + rs)
                         for c in range(ci, ci + cs)
                         if r < len(data) and c < len(data[r])]
                cell_text = " ".join(p for p in parts if p)
            x0 = bbox.x0 + ci * cw
            y1 = bbox.y1 - ri * ch
            cells.append(CellIR(
                text=cell_text,
                bbox=BBox(x0, y1 - ch * rs, x0 + cw * cs, y1),
                row=ri,
                col=ci,
                rowspan=rs,
                colspan=cs,
                is_header=(ri == 0),
                alignment=LEFT,
            ))
    return cells


def _detect_header(data: list[list[str | None]]) -> bool:
    """A7 (reference detector.py:298-350): all-caps first row, or 0.7x
    shorter average, or numberless-header-over-numeric-data."""
    if len(data) < 2:
        return False
    first = data[0]
    if not first:
        return False
    first_text = " ".join(str(c or "") for c in first)
    if first_text.isupper() and len(first_text) > 3:
        return True
    first_avg = sum(len(str(c or "")) for c in first) / len(first)
    others = [sum(len(str(c or "")) for c in row) / len(row)
              for row in data[1:] if row]
    if others:
        if first_avg < (sum(others) / len(others)) * 0.7:
            return True
    has_numbers = any(_NUM_RE.search(str(c or "")) for c in first if c)
    data_numbers = any(
        any(_NUM_RE.search(str(c or "")) for c in row if c)
        for row in data[1:]
    )
    return (not has_numbers) and data_numbers


COL_GAP = 12.0     # x-gap splitting a line into cells (text strategy)
ALIGN_TOL = 5.0    # column x-start alignment tolerance across rows


def detect_text_tables(lines, page_height: float) -> list[TableIR]:
    """Whitespace-lattice ("text" strategy) table detection — an
    EXTENSION beyond the reference (which only does ruled "lines"
    detection, detector.py:45-50); off by default in the analyzer to
    preserve output parity (config.TABLES has no such switch; callers
    opt in via analyze_page(text_tables=True)).

    Heuristic: consecutive lines that split into >= 2 cell groups at
    x-gaps > COL_GAP, whose column x-starts align within ALIGN_TOL,
    form a candidate table; converted through the SAME y-flip /
    uniform-grid / header / validation path as ruled tables."""
    rows: list[tuple[object, list[tuple[float, str]]]] = []
    for ln in sorted(lines, key=lambda l: l.bbox.y0):
        cells: list[tuple[float, str]] = []
        cur_x0 = None
        cur_text: list[str] = []
        last_x1 = None
        for s in sorted(ln.spans, key=lambda s: s.bbox.x0):
            if last_x1 is not None and s.bbox.x0 - last_x1 > COL_GAP:
                cells.append((cur_x0, " ".join(cur_text)))
                cur_x0, cur_text = None, []
            if cur_x0 is None:
                cur_x0 = s.bbox.x0
            cur_text.append(s.text)
            last_x1 = s.bbox.x1
        if cur_x0 is not None:
            cells.append((cur_x0, " ".join(cur_text)))
        rows.append((ln, cells))

    tables: list[TableIR] = []
    group: list[tuple[object, list[tuple[float, str]]]] = []

    def aligned(a: list[tuple[float, str]],
                b: list[tuple[float, str]]) -> bool:
        if len(a) != len(b) or len(a) < TABLES.min_cols:
            return False
        return all(abs(x1 - x2) <= ALIGN_TOL
                   for (x1, _), (x2, _) in zip(a, b))

    def flush() -> None:
        if len(group) < TABLES.min_rows:
            return
        data = [[txt for _, txt in cells] for _, cells in group]
        xs_starts = [x for x, _ in group[0][1]]
        x1 = max(ln.bbox.x1 for ln, _ in group)
        ys = ([min(ln.bbox.y0 for ln, _ in group)]
              + [ln.bbox.y1 for ln, _ in group])
        t = _convert(data, xs_starts + [x1], ys, page_height)
        if t and _validate(t):
            tables.append(t)

    for item in rows:
        _, cells = item
        if len(cells) >= TABLES.min_cols and (
                not group or aligned(group[-1][1], cells)):
            group.append(item)
        else:
            flush()
            group = [item] if len(cells) >= TABLES.min_cols else []
    flush()
    return tables


def _validate(t: TableIR) -> bool:
    """P9 (reference detector.py:352-379)."""
    if t.num_rows < TABLES.min_rows or t.num_cols < TABLES.min_cols:
        return False
    if t.bbox.width < TABLES.min_cell_w * 2:
        return False
    if t.bbox.height < TABLES.min_cell_h * 2:
        return False
    non_empty = sum(1 for c in t.cells if c.text.strip())
    if t.cells and non_empty / len(t.cells) < TABLES.min_fill_frac:
        return False
    return True
