"""Byte-identical golden tests for complex-layout fixtures (SURVEY.md
§5.2 item 2): the committed goldens freeze the reference-semantics output
of the full pipeline — any layout/formatter change that shifts a byte
fails here."""

import json
import os

import pytest

from tests.fixtures import FIXTURES

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("name", sorted(FIXTURES))
@pytest.mark.parametrize("fmt,ext", [("text", "txt"), ("markdown", "md"),
                                     ("json", "json")])
def test_golden(name, fmt, ext):
    from pdf_parser_spark.extractor import parse_pdf_document
    from pdf_parser_spark.render import formatter

    doc = parse_pdf_document(f"fixture://{name}", FIXTURES[name]())
    out = formatter.format_document(doc, fmt)
    with open(os.path.join(GOLDEN_DIR, f"{name}.{ext}")) as f:
        golden = f.read()
    assert out == golden  # byte-identical


def test_twocol_structure():
    from pdf_parser_spark.extractor import parse_pdf_document

    doc = parse_pdf_document("u", FIXTURES["twocol"]())
    page = doc.pages[0]
    assert page.header == "Conference Proceedings Vol 7"
    assert page.footer == "Page 1"
    assert len(page.columns) == 2
    # center-spanning title prepended to column 0 (columns.py:186-189)
    col0_types = [b.block_type for b in page.columns[0].blocks]
    assert "HEADING" in col0_types
    assert {b.column_index for b in page.blocks} == {0, 1}


def test_report_structure():
    from pdf_parser_spark.extractor import parse_pdf_document

    doc = parse_pdf_document("u", FIXTURES["report"]())
    page = doc.pages[0]
    assert page.table_count == 1 if hasattr(page, "table_count") \
        else len(page.tables) == 1
    t = page.tables[0]
    assert t.has_header
    types = {b.block_type for b in page.blocks}
    assert {"HEADING", "LIST_ITEM", "PARAGRAPH"} <= types


def test_golden_json_schema():
    with open(os.path.join(GOLDEN_DIR, "multipage.json")) as f:
        d = json.load(f)
    assert d["page_count"] == 3
    assert [p["page_number"] for p in d["pages"]] == [1, 2, 3]
