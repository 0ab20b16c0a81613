"""Hand-built fixture PDFs covering every operator branch (FIXTURES.md §2)
and their golden outputs. Goldens live in tests/goldens/ and are asserted
byte-identical (SURVEY.md §5.2)."""

from __future__ import annotations

from pdf_parser_spark.pdf.writer import Page, Rule, Text, build_pdf


def _col_lines(x0, y_top, lines, font="F1", size=10.0, leading=12.0):
    out = []
    y = y_top
    for ln in lines:
        out.append(Text(x0, y, ln, font, size))
        y -= leading
    return out, y


def pdf_twocol() -> bytes:
    """Centered 18pt bold title + two 3-block columns + header/footer.
    Exercises C1/C3, P4, P8 center-keep, O3 ordering."""
    texts = [Text(72, 730, "Conference Proceedings Vol 7", "F1", 9)]  # header y1<72
    texts.append(Text(230, 660, "A Study of Columns", "F2", 18))      # title
    left, y = _col_lines(72, 600, [
        "left column first line here",
        "continues on a second line",
    ])
    left2, y = _col_lines(72, y - 16, [
        "left second paragraph text",
        "with its own second line",
    ])
    left3, _ = _col_lines(72, y - 16, ["left third short block"])
    right, y = _col_lines(330, 600, [
        "right column begins reading",
        "here with more content",
    ])
    right2, y = _col_lines(330, y - 16, [
        "right second paragraph body",
        "continuing the right side",
    ])
    right3, _ = _col_lines(330, y - 16, ["right third short block"])
    texts += left + left2 + left3 + right + right2 + right3
    texts.append(Text(290, 40, "Page 1", "F1", 9))  # footer y0 > h-72
    return build_pdf([Page(texts=texts)],
                     info={"Title": "Two Column Study",
                           "Author": "Fixture Author"})


def pdf_report() -> bytes:
    """Headings (20/16/13pt bold), ALL-CAPS, list items, hyphenation,
    and a ruled table with caps header — multi-feature single page."""
    texts = [
        Text(72, 700, "Annual Report", "F2", 20),
        Text(72, 660, "Financial Summary", "F2", 16),
        Text(72, 625, "SECTION OVERVIEW", "F1", 10),
        Text(72, 600, "1. first listed item with detail", "F1", 10),
        Text(72, 585, "2) second listed item as well", "F1", 10),
        Text(72, 550, "This paragraph demonstrates hyphen-", "F1", 10),
        Text(72, 538, "ation repair across wrapped lines", "F1", 10),
    ]
    # ruled 3x2 table at top-y 480 (PDF coords)
    xs = [72, 192, 312]
    ys = [480, 456, 432]
    rules = []
    for y in ys:
        rules.append(Rule(xs[0], y, xs[-1], y))
    for x in xs:
        rules.append(Rule(x, ys[-1], x, ys[0]))
    texts += [
        Text(76, 464, "METRIC", "F1", 9),
        Text(196, 464, "VALUE", "F1", 9),
        Text(76, 440, "revenue", "F1", 9),
        Text(196, 440, "1042.5", "F1", 9),
    ]
    return build_pdf([Page(texts=texts, rules=rules)],
                     info={"Title": "Annual Report"})


def pdf_multipage() -> bytes:
    """Three pages with running headers/footers and page-range-able
    content (S5 banners, P4 per page)."""
    pages = []
    for p in range(1, 4):
        texts = [Text(72, 740, f"Running Header {p}", "F1", 8)]
        body, _ = _col_lines(72, 650, [
            f"page {p} body first line",
            f"page {p} body second line",
        ], size=11.0, leading=13.0)
        texts += body
        texts.append(Text(280, 36, f"- {p} -", "F1", 8))
        pages.append(Page(texts=texts))
    return build_pdf(pages, info={"Title": "Multi Page"})


FIXTURES = {
    "twocol": pdf_twocol,
    "report": pdf_report,
    "multipage": pdf_multipage,
}
