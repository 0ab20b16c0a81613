"""Intermediate representation for per-page layout analysis.

Mirrors the reference's dataclass model (output/models.py:39-473,
core/page.py:22-62) in mutable-lite form. These objects live only inside
the extraction UDF — they are never shipped through Spark; the UDF emits
flat Arrow columns (see engine.job).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Block types (reference output/models.py:16-26; only the first three +
# UNKNOWN are ever assigned — paragraphs.py:300-323).
PARAGRAPH = "PARAGRAPH"
HEADING = "HEADING"
LIST_ITEM = "LIST_ITEM"
UNKNOWN = "UNKNOWN"

# Alignments (reference output/models.py:29-36; CENTER never assigned).
LEFT = "LEFT"
RIGHT = "RIGHT"
JUSTIFY = "JUSTIFY"


@dataclass(slots=True)
class BBox:
    """Axis-aligned box. The coordinate frame is contextual (SURVEY.md
    §1.4): text objects are top-left-origin y-down; detected tables are
    flipped to bottom-left-origin — exactly like the reference."""

    x0: float
    y0: float
    x1: float
    y1: float

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0

    def intersects(self, o: "BBox") -> bool:
        """Closed-interval overlap — touching edges DO intersect
        (reference output/models.py:86-93, tested test_models.py:71-76)."""
        return not (
            self.x1 < o.x0 or o.x1 < self.x0
            or self.y1 < o.y0 or o.y1 < self.y0
        )

    def horizontal_overlap(self, o: "BBox") -> float:
        """Overlap width / min width (reference models.py:117-136)."""
        ov = min(self.x1, o.x1) - max(self.x0, o.x0)
        if ov <= 0:
            return 0.0
        mw = min(self.width, o.width)
        return ov / mw if mw > 0 else 0.0


def union_bbox(boxes: list[BBox]) -> BBox:
    if not boxes:
        return BBox(0.0, 0.0, 0.0, 0.0)
    # single pass instead of four generator sweeps (hot in layout; same
    # min/max floats exactly)
    b = boxes[0]
    x0, y0, x1, y1 = b.x0, b.y0, b.x1, b.y1
    for b in boxes[1:]:
        if b.x0 < x0:
            x0 = b.x0
        if b.y0 < y0:
            y0 = b.y0
        if b.x1 > x1:
            x1 = b.x1
        if b.y1 > y1:
            y1 = b.y1
    return BBox(x0, y0, x1, y1)


@dataclass(slots=True)
class SpanIR:
    """Reference output/models.py:159-172 (TextSpan + FontInfo)."""

    text: str
    bbox: BBox
    font: str
    size: float
    bold: bool
    italic: bool
    color: tuple[int, int, int] = (0, 0, 0)


@dataclass(slots=True)
class LineIR:
    """Reference core/page.py:22-38 (RawLine)."""

    bbox: BBox
    text: str
    spans: list[SpanIR] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not self.text.strip()


@dataclass(slots=True)
class BlockIR:
    """Reference core/page.py:41-62 (RawTextBlock)."""

    bbox: BBox
    lines: list[LineIR] = field(default_factory=list)
    spans: list[SpanIR] = field(default_factory=list)

    @property
    def text(self) -> str:
        # newline-join of non-blank lines (reference page.py:54-57)
        return "\n".join(ln.text for ln in self.lines if ln.text.strip())

    @property
    def is_empty(self) -> bool:
        return not self.lines or all(ln.is_empty for ln in self.lines)


@dataclass(slots=True)
class TextBlockIR:
    """Reference output/models.py:175-208 (TextBlock)."""

    text: str
    bbox: BBox
    block_type: str = UNKNOWN
    spans: list[SpanIR] = field(default_factory=list)
    alignment: str = LEFT
    indentation: float = 0.0
    line_spacing: float = 0.0
    column_index: int = 0


@dataclass(slots=True)
class CellIR:
    """Reference output/models.py:211-239."""

    text: str
    bbox: BBox
    row: int
    col: int
    rowspan: int = 1
    colspan: int = 1
    is_header: bool = False
    alignment: str = LEFT


@dataclass
class TableIR:
    """Reference output/models.py:242-320."""

    cells: list[CellIR]
    bbox: BBox  # FLIPPED frame (bottom-left origin), reference detector.py:208-214
    num_rows: int
    num_cols: int
    has_header: bool = False
    ascii_representation: str = ""

    def get_cell(self, row: int, col: int) -> CellIR | None:
        """Rowspan/colspan-aware lookup (reference models.py:263-283)."""
        for c in self.cells:
            if c.row == row and c.col == col:
                return c
            if (c.row <= row < c.row + c.rowspan
                    and c.col <= col < c.col + c.colspan):
                return c
        return None

    def get_row(self, row: int) -> list[CellIR]:
        return sorted(
            (c for c in self.cells if c.row <= row < c.row + c.rowspan),
            key=lambda c: c.col,
        )


@dataclass(slots=True)
class ColumnIR:
    """Reference output/models.py:323-336."""

    bbox: BBox
    index: int
    blocks: list[TextBlockIR] = field(default_factory=list)


@dataclass
class PageIR:
    """Reference output/models.py:339-395 (StructuredPage)."""

    page_number: int
    width: float
    height: float
    blocks: list[TextBlockIR] = field(default_factory=list)
    tables: list[TableIR] = field(default_factory=list)
    columns: list[ColumnIR] = field(default_factory=list)
    header: str = ""
    footer: str = ""

    @property
    def text(self) -> str:
        """Reading-order text join (reference models.py:364-385): blocks
        and tables merged, sorted by -y1 — with text blocks in top-left
        frame and tables flipped, the documented bottom-up quirk."""
        items: list[tuple[float, str]] = []
        for b in self.blocks:
            items.append((b.bbox.y1, b.text))
        for t in self.tables:
            items.append((t.bbox.y1, t.ascii_representation))
        items.sort(key=lambda x: -x[0])
        return "\n\n".join(s for _, s in items if s.strip())


@dataclass
class DocIR:
    """Reference output/models.py:398-473 (StructuredDocument)."""

    pages: list[PageIR]
    metadata: dict[str, str] = field(default_factory=dict)
    source_path: str = ""

    @property
    def text(self) -> str:
        """Reference models.py:419-433 — '==== PAGE n ====' banners."""
        parts: list[str] = []
        for page in self.pages:
            parts.append(f"\n{'=' * 80}")
            parts.append(f"{'PAGE ' + str(page.page_number):^80}")
            parts.append(f"{'=' * 80}\n")
            parts.append(page.text)
        return "\n".join(parts)
