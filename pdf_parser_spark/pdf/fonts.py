"""Base-14 font metrics for the constrained PDF subset.

Widths are the published Adobe AFM values (1/1000 em) for the printable
ASCII range of Helvetica / Helvetica-Bold / Helvetica-Oblique; Courier
variants are monospace 600. The writer (``pdf.writer``) and the tokenizer
(``pdf.tokenizer``) share THIS table, so span-bbox geometry is exactly
self-consistent — which is what the reference's layout thresholds
(SURVEY.md §2) operate on.

Bold/italic detection mirrors the reference core/page.py:727-730:
``flags & 16`` or "bold" in name; ``flags & 2`` or "italic" in name.
"""

from __future__ import annotations

import numpy as np

# Printable ASCII 32..126 widths (1/1000 em), Adobe AFM order.
_HELV = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]
_HELV_BOLD = [
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333,
    584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611, 778, 722, 278,
    556, 722, 611, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 333, 278, 333, 584, 556, 333, 556, 611, 556, 611, 556,
    333, 611, 611, 278, 278, 556, 278, 889, 611, 611, 611, 611, 389, 556,
    333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584,
]


def _width_array(ascii_widths: list[int]) -> np.ndarray:
    """256-entry width table; non-printable / high bytes get the space
    width (our subset never emits them inside show-text strings)."""
    arr = np.full(256, ascii_widths[0], dtype=np.float64)
    arr[32 : 32 + len(ascii_widths)] = ascii_widths
    return arr


_COURIER = np.full(256, 600.0, dtype=np.float64)

# BaseFont name -> (width table /1000, ascender /1000, descender /1000)
FONTS: dict[str, tuple[np.ndarray, float, float]] = {
    "Helvetica": (_width_array(_HELV), 0.718, -0.207),
    "Helvetica-Bold": (_width_array(_HELV_BOLD), 0.718, -0.207),
    "Helvetica-Oblique": (_width_array(_HELV), 0.718, -0.207),
    "Helvetica-BoldOblique": (_width_array(_HELV_BOLD), 0.718, -0.207),
    "Courier": (_COURIER, 0.629, -0.157),
    "Courier-Bold": (_COURIER, 0.629, -0.157),
    "Courier-Oblique": (_COURIER, 0.629, -0.157),
    "Courier-BoldOblique": (_COURIER, 0.629, -0.157),
    "Times-Roman": (_width_array(_HELV), 0.683, -0.217),  # proxy widths
    "Times-Bold": (_width_array(_HELV_BOLD), 0.683, -0.217),
    "Times-Italic": (_width_array(_HELV), 0.683, -0.217),
    "Times-BoldItalic": (_width_array(_HELV_BOLD), 0.683, -0.217),
}

_DEFAULT = FONTS["Helvetica"]

# plain-list twin of the width tables: for the short strings of one
# show op, sum(map(list.__getitem__, bytes)) measured 3x the numpy
# fancy-index path (r6); char_advances keeps the vectorized form
_FONT_WIDTH_LISTS: dict[str, list[float]] = {
    name: arr.tolist() for name, (arr, _, _) in FONTS.items()}
_DEFAULT_WIDTH_LIST = _FONT_WIDTH_LISTS["Helvetica"]


def metrics(base_font: str) -> tuple[np.ndarray, float, float]:
    return FONTS.get(base_font, _DEFAULT)


def text_width(text: str, base_font: str, size: float,
               char_spacing: float = 0.0, word_spacing: float = 0.0) -> float:
    """Advance width of ``text`` in points (PDF Tj semantics: per-glyph
    width + Tc per glyph + Tw per byte-32 space)."""
    if not text:
        return 0.0
    widths = _FONT_WIDTH_LISTS.get(base_font, _DEFAULT_WIDTH_LIST)
    b = text.encode("latin-1", "replace")
    # summation-order-independent: AFM widths are integers, so the sum
    # is exact in float64 regardless of order (bit-identical to the
    # previous numpy pairwise sum — geometry goldens unaffected)
    w = sum(map(widths.__getitem__, b)) * size / 1000.0
    w += char_spacing * len(b)
    if word_spacing:
        w += word_spacing * b.count(32)
    return w


def char_advances(text: str, base_font: str, size: float,
                  char_spacing: float = 0.0,
                  word_spacing: float = 0.0) -> np.ndarray:
    """Per-character advance widths in points (for span-offset geometry)."""
    widths = metrics(base_font)[0]
    b = text.encode("latin-1", "replace")
    a = np.frombuffer(b, dtype=np.uint8)
    adv = widths[a] * size / 1000.0 + char_spacing
    if word_spacing:
        adv = adv + np.where(a == 32, word_spacing, 0.0)
    return adv


def is_bold(name: str, flags: int = 0) -> bool:
    """Reference core/page.py:727-728."""
    return bool(flags & 16) or "bold" in name.lower()


def is_italic(name: str, flags: int = 0) -> bool:
    """Reference core/page.py:729-730."""
    return bool(flags & 2) or "italic" in name.lower() or "oblique" in name.lower()
