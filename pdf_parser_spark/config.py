"""Layout / table / extraction thresholds.

Every constant mirrors a load-bearing threshold in the reference
(karanvora2599/PDF_Parser); citations are reference ``file:line``.
These are *semantic* constants — changing one changes extracted bytes.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LayoutConfig:
    """Reference: core/analyzer.py:49-54 (LayoutConfig defaults)."""

    header_margin: float = 72.0   # analyzer.py:197 — bbox.y1 < 72 => header
    footer_margin: float = 72.0   # analyzer.py:199 — bbox.y0 > h-72 => footer

    # Span -> line space inference: insert " " iff x-gap > size * 0.3
    # (page.py:79 SPACE_THRESHOLD, applied page.py:677-689).
    space_threshold: float = 0.3

    # Line/block vertical adjacency (page.py:213-235): overlap > 20% of the
    # smaller height OR centers within 5pt.
    v_overlap_frac: float = 0.2
    v_center_dist: float = 5.0

    # Merged-line horizontal join: insert " " iff x-gap > 5 (page.py:347-350).
    line_merge_gap: float = 5.0

    # Column boundary band: blocks spanning boundary +/- 30pt are "wide"
    # (page.py:183); 1-line blocks centered within 50pt of the boundary are
    # kept whole (page.py:369-374).
    wide_band: float = 30.0
    center_keep_dist: float = 50.0

    # Two-column detection (columns.py:101-191).
    min_blocks_two_col: int = 4       # columns.py:114-116
    col_center_band: float = 30.0     # columns.py:124-138
    min_blocks_per_side: int = 2      # columns.py:140-141
    min_column_gap: float = 10.0      # columns.py:143-151
    column_margin: float = 50.0       # columns.py:155-170

    # Gap-based N-column fallback (columns.py:193-286).
    gap_threshold: float = 20.0       # columns.py:207-234

    # Paragraph merge tests (paragraphs.py:111-161).
    para_h_overlap: float = 0.8       # paragraphs.py:126-129
    para_width_ratio: float = 0.7     # paragraphs.py:131-137
    para_gap_factor: float = 1.2      # paragraphs.py:139-153 (x avg font size)
    para_indent_factor: float = 1.5   # paragraphs.py:155-159

    # Default font size when a block has no spans (paragraphs.py:163-173).
    default_font_size: float = 12.0

    # Heading classifier (paragraphs.py:285-316).
    heading_max_chars: int = 100
    heading_min_size: float = 14.0
    heading_caps_min_len: int = 3


@dataclass(frozen=True)
class TableSettings:
    """Reference: tables/detector.py:33-54 (TableSettings defaults)."""

    snap_tolerance: float = 3.0   # detector.py:45-50 (lattice snap)
    min_rows: int = 2             # detector.py:358-362
    min_cols: int = 2             # detector.py:358-362
    min_cell_w: float = 10.0      # detector.py:53-54 (bbox >= 2x min dims)
    min_cell_h: float = 5.0
    min_fill_frac: float = 0.3    # detector.py:371-377 (>=30% non-empty)


@dataclass(frozen=True)
class AsciiStyle:
    """Reference: tables/ascii_converter.py:19-41."""

    h: str = "-"
    v: str = "|"
    corner: str = "+"
    min_col_width: int = 3        # ascii_converter.py:39
    max_col_width: int = 40       # ascii_converter.py:40
    padding: int = 1


@dataclass(frozen=True)
class HtmlConfig:
    """Boilerplate scoring knobs for the HTML path (north-star addition;
    readability/trafilatura-style text-density + link-density heuristics —
    no reference analog)."""

    min_block_chars: int = 25       # blocks shorter than this need low link density
    max_link_density: float = 0.33  # chars-in-anchors / chars
    drop_tags: frozenset = frozenset(
        {"script", "style", "nav", "footer", "header", "aside", "form",
         "noscript", "template", "svg", "iframe", "button", "select"}
    )
    block_tags: frozenset = frozenset(
        {"p", "div", "article", "section", "li", "td", "pre", "blockquote",
         "h1", "h2", "h3", "h4", "h5", "h6", "main", "body", "tr", "table",
         "ul", "ol"}
    )


LAYOUT = LayoutConfig()
TABLES = TableSettings()
ASCII = AsciiStyle()
HTML = HtmlConfig()

PAGE_WIDTH = 612.0   # US Letter, reference fixtures' implicit default
PAGE_HEIGHT = 792.0
