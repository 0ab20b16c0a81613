"""Table lattice detection (T1-T3), header detect (A7), validation (P9),
anti-join (P10), ASCII/markdown render (T4-T6, F6/F7)."""

import pytest

from pdf_parser_spark.extractor import parse_pdf_document
from pdf_parser_spark.layout.ir import BBox, CellIR, TableIR
from pdf_parser_spark.layout.tables import detect_tables, _detect_header
from pdf_parser_spark.pdf.tokenizer import parse_pdf
from pdf_parser_spark.pdf.writer import Page, Rule, Text, build_pdf
from pdf_parser_spark.render import ascii_table


def grid_rules(x0, y0, cols_w, rows_h):
    """Build lattice rules for a uniform grid at (x0, y0) PDF coords
    (y0 = TOP edge in PDF space, rows go down)."""
    xs = [x0 + i * cols_w[0] for i in range(len(cols_w) + 1)]
    ys = [y0 - i * rows_h[0] for i in range(len(rows_h) + 1)]
    rules = []
    for y in ys:
        rules.append(Rule(xs[0], y, xs[-1], y))
    for x in xs:
        rules.append(Rule(x, ys[-1], x, ys[0]))
    return xs, ys, rules


def fixture_table_pdf():
    """pdf-table fixture (FIXTURES.md): ruled 3-col x 3-row table, ALL-CAPS
    header, numeric data, plus one overlapping text block and one free
    paragraph."""
    xs, ys, rules = grid_rules(100, 600, [120, 120, 120], [24, 24, 24])
    texts = []
    header = ["NAME", "QTY", "PRICE"]
    rows = [["widget", "100", "10.5"], ["gadget", "250", "15.0"]]
    for ci, h in enumerate(header):
        texts.append(Text(xs[ci] + 4, ys[0] - 16, h, "F1", 10))
    for ri, row in enumerate(rows):
        for ci, v in enumerate(row):
            texts.append(Text(xs[ci] + 4, ys[ri + 1] - 16, v, "F1", 10))
    # block overlapping the table region (anti-joined away, P10)
    texts.append(Text(xs[0], ys[-1] - 40, "caption inside table zone"))
    # normal paragraph well below
    texts.append(Text(72, 300, "a free paragraph outside the table"))
    return build_pdf([Page(texts=texts, rules=rules)])


def test_lattice_detection_end_to_end():
    doc = parse_pdf_document("u", fixture_table_pdf())
    page = doc.pages[0]
    assert len(page.tables) == 1
    t = page.tables[0]
    assert (t.num_rows, t.num_cols) == (3, 3)
    assert t.has_header  # ALL-CAPS first row (detector.py:315-318)
    cells = {(c.row, c.col): c.text for c in t.cells}
    assert cells[(0, 0)] == "NAME"
    assert cells[(2, 2)] == "15.0"


def test_table_bbox_flipped_frame():
    pdf = parse_pdf(fixture_table_pdf())
    tables = detect_tables(
        pdf.pages[0].segments,
        [__import__("pdf_parser_spark.layout.analyzer",
                    fromlist=["to_span_ir"]).to_span_ir(s)
         for s in pdf.pages[0].spans],
        pdf.pages[0].height)
    (t,) = tables
    # grid top edge at PDF y=600 -> flipped y1 = 600; bottom 528 -> y0=528
    assert t.bbox.y1 == pytest.approx(600, abs=1)
    assert t.bbox.y0 == pytest.approx(528, abs=1)


def test_ascii_render_exact():
    doc = parse_pdf_document("u", fixture_table_pdf())
    a = doc.pages[0].tables[0].ascii_representation
    lines = a.split("\n")
    # top + after-header + bottom separators (no per-row rules)
    assert sum(1 for ln in lines if ln.startswith("+")) == 3
    assert "| NAME" in a and "| widget" in a
    # exact border geometry: width 6 (max 'widget') for col0
    assert lines[0] == "+--------+-----+-------+"


def test_anti_join_removes_overlapping_block():
    doc = parse_pdf_document("u", fixture_table_pdf())
    texts = [b.text for b in doc.pages[0].blocks]
    assert any("free paragraph" in t for t in texts)
    # caption overlapped the flipped table bbox in y -> anti-joined away
    # (mixed-frame quirk: caption top-left y ~ 208-232 vs table flipped
    # frame y 528-600; NO intersection in y -> caption SURVIVES)
    assert any("caption" in t for t in texts)


def test_header_detect_short_row():
    data = [["a", "b"], ["longer content here", "even longer content"],
            ["more data content", "again quite long"]]
    assert _detect_header(data)


def test_header_detect_numberless_over_numeric():
    data = [["name", "qty"], ["x", "1"], ["y", "2"]]
    assert _detect_header(data)


def test_header_not_detected_uniform():
    data = [["aaaa1", "bbbb2"], ["cccc3", "dddd4"]]
    assert not _detect_header(data)


def test_validation_rejects_small_and_empty():
    pdf = parse_pdf(build_pdf([Page(
        rules=grid_rules(100, 600, [120, 120], [24, 24])[2])]))
    # empty cells (no spans) -> <30% fill -> rejected (detector.py:371-377)
    tables = detect_tables(pdf.pages[0].segments, [], pdf.pages[0].height)
    assert tables == []


def make_table(cells, nrows, ncols, header=False):
    return TableIR(cells=cells, bbox=BBox(0, 0, 100, 100),
                   num_rows=nrows, num_cols=ncols, has_header=header)


def test_wrap_long_word_hyphen_split():
    # F6: 60-char unbroken word in a 40-wide cell splits at width-1 + '-'
    word = "x" * 60
    cells = [
        CellIR("head", BBox(0, 90, 50, 100), 0, 0),
        CellIR("h2", BBox(50, 90, 100, 100), 0, 1),
        CellIR(word, BBox(0, 0, 50, 90), 1, 0),
        CellIR("y", BBox(50, 0, 100, 90), 1, 1),
    ]
    t = make_table(cells, 2, 2)
    a = ascii_table.convert(t)
    assert "x" * 39 + "-" in a
    # col0 clamped to 40, col1 at min width 3: |·40·|·3·| = 50 chars
    assert max(len(ln) for ln in a.split("\n")) == 50


def test_markdown_table_always_separates_header():
    cells = [CellIR("a", BBox(0, 50, 50, 100), 0, 0),
             CellIR("b", BBox(50, 50, 100, 100), 0, 1),
             CellIR("c", BBox(0, 0, 50, 50), 1, 0),
             CellIR("d", BBox(50, 0, 100, 50), 1, 1)]
    md = ascii_table.convert_to_markdown(make_table(cells, 2, 2))
    lines = md.split("\n")
    assert lines[1] == "| --- | --- |"


def test_empty_table_renders_empty():
    t = make_table([], 0, 0)
    assert ascii_table.convert(t) == ""


def test_text_strategy_table_detection():
    """Whitespace-aligned columns with NO ruled lines (extension beyond
    the reference's lines-only strategy; opt-in)."""
    from pdf_parser_spark.layout.analyzer import analyze_page
    from pdf_parser_spark.pdf.writer import Page, Text, build_pdf

    texts = [Text(72, 700, "A paragraph above the table area", "F1", 10)]
    rows = [("NAME", "QTY", "PRICE"),
            ("widget", "100", "10.5"),
            ("gadget", "250", "15.0")]
    for ri, row in enumerate(rows):
        y = 600 - ri * 14
        for x, val in zip((72, 220, 340), row):
            texts.append(Text(x, y, val, "F1", 10))
    pdf = parse_pdf(build_pdf([Page(texts=texts)]))

    # default: reference parity -> NO table
    assert analyze_page(pdf.pages[0]).tables == []
    # opt-in: whitespace lattice found
    page = analyze_page(pdf.pages[0], text_tables=True)
    assert len(page.tables) == 1
    t = page.tables[0]
    assert (t.num_rows, t.num_cols) == (3, 3)
    assert t.has_header
    cells = {(c.row, c.col): c.text for c in t.cells}
    assert cells[(1, 0)] == "widget" and cells[(2, 2)] == "15.0"
    # the paragraph above is untouched
    assert any("paragraph above" in b.text for b in page.blocks)


def test_text_strategy_ignores_prose():
    """Ordinary paragraphs (single cell per line) must never become
    tables."""
    from pdf_parser_spark.layout.analyzer import analyze_page
    from pdf_parser_spark.datagen.pages import render_pdf_doc

    pdf = parse_pdf(render_pdf_doc(
        "plain prose words flowing along many lines without columns "
        "repeated again and again to make several lines", 3))
    page = analyze_page(pdf.pages[0], text_tables=True)
    assert page.tables == []


def fixture_merged_cell_pdf():
    """3x3 lattice with the interior vertical rule between cols 0-1
    MISSING in the header row -> cells (0,0)+(0,1) merge (colspan 2)."""
    x0, top = 100, 600
    xs = [x0 + 120 * i for i in range(4)]
    ys = [top - 24 * i for i in range(4)]  # PDF y, top-down rows
    rules = [Rule(xs[0], y, xs[-1], y) for y in ys]
    rules += [Rule(xs[0], ys[-1], xs[0], ys[0]),
              Rule(xs[3], ys[-1], xs[3], ys[0]),
              Rule(xs[2], ys[-1], xs[2], ys[0]),
              # x=xs[1]: rows 1-2 only; header-row segment absent
              Rule(xs[1], ys[-1], xs[1], ys[1])]
    texts = [Text(xs[0] + 4, ys[0] - 16, "WIDE", "F1", 10),
             Text(xs[2] + 4, ys[0] - 16, "HDR", "F1", 10)]
    data = [["b1", "c2", "d3"], ["e4", "f5", "g6"]]
    for ri, row in enumerate(data):
        for ci, v in enumerate(row):
            texts.append(Text(xs[ci] + 4, ys[ri + 1] - 16, v, "F1", 10))
    return build_pdf([Page(texts=texts, rules=rules)])


def test_pdf_merged_cell_inference():
    """Missing interior rules become rowspan/colspan CellIRs through the
    shared TableIR (r2 verdict item 7)."""
    doc = parse_pdf_document("u", fixture_merged_cell_pdf())
    (t,) = doc.pages[0].tables
    anchors = {(c.row, c.col): c for c in t.cells}
    assert (0, 0) in anchors and anchors[(0, 0)].colspan == 2
    assert anchors[(0, 0)].text == "WIDE"
    assert (0, 1) not in anchors          # covered by the anchor
    assert t.get_cell(0, 1).text == "WIDE"  # rowspan-aware lookup
    # every other cell stays 1x1
    assert all(c.colspan == 1 and c.rowspan == 1
               for c in t.cells if (c.row, c.col) != (0, 0))


def test_pdf_merged_cell_renders_like_html_equivalent():
    """The merged-cell PDF fixture renders byte-identically to the
    equivalent HTML colspan table (shared TableIR + renderer)."""
    from pdf_parser_spark.html.extract import extract_html

    doc = parse_pdf_document("u", fixture_merged_cell_pdf())
    pdf_ascii = doc.pages[0].tables[0].ascii_representation

    html = (b"<html><body><table>"
            b"<tr><th colspan=2>WIDE</th><th>HDR</th></tr>"
            b"<tr><td>b1</td><td>c2</td><td>d3</td></tr>"
            b"<tr><td>e4</td><td>f5</td><td>g6</td></tr>"
            b"</table><p>enough surrounding prose to keep the page "
            b"nonempty for the extractor</p></body></html>")
    res = extract_html(html)
    html_table_lines = [ln for ln in res["text"].split("\n")
                        if ln.startswith(("|", "+"))]
    assert pdf_ascii.strip().split("\n") == html_table_lines


def test_fully_ruled_lattice_has_no_merged_cells():
    """Parity guard: a complete rule grid must keep producing only 1x1
    cells (merged-cell inference changes nothing when rules exist)."""
    doc = parse_pdf_document("u", fixture_table_pdf())
    (t,) = doc.pages[0].tables
    assert all(c.rowspan == 1 and c.colspan == 1 for c in t.cells)
    assert len(t.cells) == 9
