"""Tokenizer unit tests: writer -> tokenizer inverse property, operator
branches from FIXTURES.md §2."""

import pytest

from pdf_parser_spark.pdf import fonts
from pdf_parser_spark.pdf.tokenizer import PdfError, is_pdf, parse_pdf
from pdf_parser_spark.pdf.writer import Page, Rect, Rule, Text, build_pdf


def make(texts, rules=(), info=None, **kw):
    return build_pdf([Page(texts=list(texts), rules=list(rules), **kw)],
                     info=info)


def test_magic_sniff():
    assert is_pdf(b"%PDF-1.4\n...")
    assert not is_pdf(b"<html></html>")


def test_empty_bytes_raises():
    with pytest.raises(PdfError):
        parse_pdf(b"")


def test_garbage_raises():
    with pytest.raises(PdfError):
        parse_pdf(b"%PDF-1.4\n\x00\x01\x02 nothing here")


def test_single_span_geometry():
    data = make([Text(72, 700, "Hello", "F1", 12)])
    page = parse_pdf(data).pages[0]
    assert page.width == 612 and page.height == 792
    (s,) = page.spans
    assert s.text == "Hello"
    assert s.x0 == 72.0
    # top-left frame: y0 = H - (baseline + asc*size)
    assert s.y0 == pytest.approx(792 - (700 + 0.718 * 12))
    assert s.x1 - s.x0 == pytest.approx(
        fonts.text_width("Hello", "Helvetica", 12))


def test_bold_italic_flags():
    data = make([Text(72, 700, "B", "F2", 12), Text(72, 650, "I", "F3", 12)])
    s1, s2 = parse_pdf(data).pages[0].spans
    assert s1.bold and not s1.italic
    assert s2.italic and not s2.bold


def test_escapes_roundtrip():
    data = make([Text(72, 700, "a(b)c\\d", "F1", 12)])
    assert parse_pdf(data).pages[0].spans[0].text == "a(b)c\\d"


def test_multipage_order():
    data = build_pdf([
        Page(texts=[Text(72, 700, "page one")]),
        Page(texts=[Text(72, 700, "page two")]),
    ])
    f = parse_pdf(data)
    assert [p.number for p in f.pages] == [1, 2]
    assert f.pages[1].spans[0].text == "page two"


def test_metadata_truthy_filter():
    data = make([Text(72, 700, "x")], info={"Title": "T", "Author": ""})
    meta = parse_pdf(data).metadata
    # reference document.py:177-178: falsy values filtered
    assert meta == {"Title": "T"}


def test_rect_and_rule_segments():
    data = make([Text(72, 700, "x")],
                rules=[Rect(100, 100, 50, 30), Rule(0, 50, 100, 50)])
    segs = parse_pdf(data).pages[0].segments
    assert len(segs) == 5  # 4 rect edges + 1 rule
    # top-left frame: rect bottom y=100 -> top 692
    ys = sorted({round(s.y0, 1) for s in segs if s.y0 == s.y1})
    assert ys == [662.0, 692.0, 742.0]


def test_uncompressed_stream():
    data = build_pdf([Page(texts=[Text(72, 700, "plain")])], compress=False)
    assert parse_pdf(data).pages[0].spans[0].text == "plain"


def test_tj_array_and_leading():
    # hand-written content stream exercising TJ / TL / T* (ops the writer
    # never emits but real PDFs use)
    from pdf_parser_spark.pdf.tokenizer import PdfPage, _interpret

    raw = (b"BT /F1 12 Tf 14 TL 72 700 Td [(Hel) -100 (lo)] TJ T* "
           b"(next) Tj ET")
    pg = PdfPage(number=1, width=612, height=792)
    _interpret(raw, pg, {"F1": "Helvetica"})
    texts = [s.text for s in pg.spans]
    assert texts == ["Hel", "lo", "next"]
    # TJ adjustment shifted 'lo' right by 100/1000*12 = 1.2pt
    hel_w = fonts.text_width("Hel", "Helvetica", 12)
    assert pg.spans[1].x0 == pytest.approx(72 + hel_w + 1.2)
    # T* moved down one leading: baseline 700-14
    assert pg.spans[2].y0 == pytest.approx(792 - (686 + 0.718 * 12))
