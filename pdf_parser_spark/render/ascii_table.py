"""ASCII / markdown / fallback table renderers (T4-T6, F6-F7).

Byte-exact re-implementation of reference tables/ascii_converter.py:43-375:
'+-|' borders, header separator only when has_header, per-column width =
max line length clamped to [3, 40], bespoke word wrap whose budget counts
``len(word) + len(current_line)`` spaces and splits over-long words at
``width-1`` with a trailing '-'.
"""

from __future__ import annotations

from ..config import ASCII
from ..layout.ir import TableIR


def convert(table: TableIR) -> str:
    """T4 (reference ascii_converter.py:72-99)."""
    if not table.cells or table.num_rows == 0 or table.num_cols == 0:
        return ""
    try:
        grid = _build_grid(table)
        widths = _column_widths(grid, table.num_cols)
        return "\n".join(_render_table(grid, widths, table.has_header))
    except Exception:
        return _fallback_convert(table)  # E3 (ascii_converter.py:97-99)


def _build_grid(table: TableIR) -> list[list[str]]:
    """Reference ascii_converter.py:101-119."""
    grid: list[list[str]] = []
    for r in range(table.num_rows):
        row: list[str] = []
        for c in range(table.num_cols):
            cell = table.get_cell(r, c)
            row.append(cell.text if cell else "")
        grid.append(row)
    return grid


def _column_widths(grid: list[list[str]], num_cols: int) -> list[int]:
    """A8 (reference ascii_converter.py:121-152): per column max line
    length over newline-split cells, clamped to [min, max]."""
    widths: list[int] = []
    for c in range(num_cols):
        mx = ASCII.min_col_width
        for row in grid:
            if c < len(row):
                for line in row[c].split("\n"):
                    mx = max(mx, len(line))
        widths.append(min(mx, ASCII.max_col_width))
    return widths


def _render_table(grid: list[list[str]], widths: list[int],
                  has_header: bool) -> list[str]:
    """Reference ascii_converter.py:154-186: separators only at top,
    after header row (iff has_header), and bottom."""
    lines = [_separator(widths)]
    for ri, row in enumerate(grid):
        lines.extend(_render_row(row, widths))
        if has_header and ri == 0:
            lines.append(_separator(widths))
    lines.append(_separator(widths))
    return lines


def _separator(widths: list[int]) -> str:
    """Reference ascii_converter.py:188-202."""
    parts = [ASCII.corner]
    for w in widths:
        parts.append(ASCII.h * (w + ASCII.padding * 2))
        parts.append(ASCII.corner)
    return "".join(parts)


def _render_row(row: list[str], widths: list[int]) -> list[str]:
    """Reference ascii_converter.py:204-253: wrap each cell, pad all to
    the same line count, ljust within width."""
    wrapped: list[list[str]] = []
    for ci, text in enumerate(row):
        if ci < len(widths):
            wrapped.append(_wrap_text(text, widths[ci]))
        else:
            wrapped.append([""])
    max_lines = max((len(c) for c in wrapped), default=1)
    for c in wrapped:
        while len(c) < max_lines:
            c.append("")
    out: list[str] = []
    pad = " " * ASCII.padding
    for li in range(max_lines):
        parts = [ASCII.v]
        for ci, w in enumerate(widths):
            cell_line = wrapped[ci][li] if ci < len(wrapped) else ""
            parts.append(f"{pad}{cell_line.ljust(w)}{pad}")
            parts.append(ASCII.v)
        out.append("".join(parts))
    return out


def _wrap_text(text: str, width: int) -> list[str]:
    """F6 (reference ascii_converter.py:255-275)."""
    if not text:
        return [""]
    lines: list[str] = []
    for para in text.split("\n"):
        if len(para) <= width:
            lines.append(para)
        else:
            lines.extend(_wrap_line(para, width))
    return lines if lines else [""]


def _wrap_line(line: str, width: int) -> list[str]:
    """Reference ascii_converter.py:277-316 — budget counts word lengths
    plus len(current_line) separator spaces; long words split at width-1
    with '-'."""
    if len(line) <= width:
        return [line]
    words = line.split()
    lines: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for word in words:
        wl = len(word)
        if cur_len + wl + len(cur) <= width:
            cur.append(word)
            cur_len += wl
        else:
            if cur:
                lines.append(" ".join(cur))
            if wl > width:
                while len(word) > width:
                    lines.append(word[: width - 1] + "-")
                    word = word[width - 1:]
                cur = [word] if word else []
                cur_len = len(word)
            else:
                cur = [word]
                cur_len = wl
    if cur:
        lines.append(" ".join(cur))
    return lines if lines else [""]


def _fallback_convert(table: TableIR) -> str:
    """T6 (reference ascii_converter.py:318-331)."""
    lines: list[str] = []
    for r in range(table.num_rows):
        lines.append(" | ".join(c.text for c in table.get_row(r)))
    return "\n".join(lines)


def convert_to_markdown(table: TableIR) -> str:
    """T5 (reference ascii_converter.py:333-369): header separator always
    after row 0."""
    if not table.cells or table.num_rows == 0 or table.num_cols == 0:
        return ""
    grid = _build_grid(table)
    widths = _column_widths(grid, table.num_cols)
    lines: list[str] = []
    for ri, row in enumerate(grid):
        cells = [
            _pad_cell(row[i] if i < len(row) else "", widths[i])
            for i in range(len(widths))
        ]
        lines.append("| " + " | ".join(cells) + " |")
        if ri == 0:
            lines.append("| " + " | ".join("-" * w for w in widths) + " |")
    return "\n".join(lines)


def _pad_cell(text: str, width: int) -> str:
    """F7 (reference ascii_converter.py:371-375)."""
    return text.replace("\n", " ").ljust(width)[:width]
