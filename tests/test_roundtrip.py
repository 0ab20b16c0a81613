"""End-to-end roundtrip invariants on the driver's documents table:
render(text) -> bytes -> full extraction pipeline -> text (whitespace-
normalized equality), per FIXTURES.md §1 and the BASELINE 'byte-identical
extracted text per url' rule (modulo the documented chunking whitespace)."""

import re

import pytest

from pdf_parser_spark.datagen.pages import (
    build_pages_pdf, doc_kind, render_pdf_doc,
)
from pdf_parser_spark.extractor import extract_document
from pdf_parser_spark.html.writer import render_html


def norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def test_html_roundtrip_all_docs(documents_pdf):
    for r in documents_pdf.itertuples():
        res = extract_document("u", render_html(r.text, r.doc_id, r.lang))
        assert res.error_kind is None, (r.doc_id, res.error_message)
        assert norm(res.body_text) == norm(r.text), r.doc_id


def test_pdf_roundtrip_all_docs(documents_pdf):
    for r in documents_pdf.itertuples():
        res = extract_document("u", render_pdf_doc(r.text, r.doc_id))
        assert res.error_kind is None, (r.doc_id, res.error_message)
        assert norm(res.body_text) == norm(r.text), r.doc_id


def test_mixed_pages_routing(documents_pdf):
    pages = build_pages_pdf(documents_pdf.head(100))
    for pr, dr in zip(pages.itertuples(), documents_pdf.itertuples()):
        res = extract_document(pr.url, pr.html)
        kind = doc_kind(dr.doc_id)
        if kind == "bad":
            assert res.error_kind == "PDFLoadError"
        else:
            assert res.error_kind is None
            assert res.doc_type == kind


def test_plain_text_banner_bytes(documents_pdf):
    r = documents_pdf.iloc[1]
    res = extract_document("u", render_pdf_doc(r.text, 1))
    lines = res.text.split("\n")
    # S5 exact banner geometry (reference formatter.py:98-102)
    assert lines[0] == ""
    assert lines[1] == "=" * 80
    assert lines[2] == f"{'PAGE 1':^80}"
    assert lines[3] == "=" * 80
    assert lines[4] == ""
    # blank line after every item (formatter.py:118-120)
    assert lines[-1] == ""


def test_multipage_long_doc():
    text = " ".join(f"w{i}" for i in range(2000))
    res = extract_document("u", render_pdf_doc(text, 7))
    assert res.n_pages > 1
    assert norm(res.body_text.replace("\n", " ")) == norm(text)
    assert f"{'PAGE 2':^80}" in res.text


def test_markdown_format(documents_pdf):
    from pdf_parser_spark.extractor import parse_pdf_document
    from pdf_parser_spark.render import formatter

    r = documents_pdf.iloc[2]
    doc = parse_pdf_document("u", render_pdf_doc(r.text, 2))
    md = formatter.format_markdown(doc)
    # front-matter from metadata title (writer sets Info /Title)
    assert md.startswith("# Document 2")


def test_json_format(documents_pdf):
    import json

    from pdf_parser_spark.extractor import parse_pdf_document
    from pdf_parser_spark.render import formatter

    r = documents_pdf.iloc[3]
    doc = parse_pdf_document("u", render_pdf_doc(r.text, 3))
    d = json.loads(formatter.format_json(doc))
    assert d["page_count"] == len(d["pages"]) == 1
    assert d["pages"][0]["blocks"]
    assert "bbox" not in d["pages"][0]["blocks"][0]  # coords gated
    d2 = json.loads(formatter.format_json(doc, include_coordinates=True))
    assert "bbox" in d2["pages"][0]["blocks"][0]


def test_empty_page_pdf():
    from pdf_parser_spark.pdf.writer import Page, build_pdf

    res = extract_document("u", build_pdf([Page(texts=[])]))
    assert res.error_kind is None
    assert res.n_blocks == 0
    assert "PAGE 1" in res.text
