"""Deterministic synthetic-HTML writer for the pages table / fixtures.

Wraps document text in an <article> of <p> chunks surrounded by realistic
boilerplate (nav menus, link-list sidebar, footer) that the extractor must
strip. Fully deterministic given (text, doc_id) — no wall clock, no RNG.
"""

from __future__ import annotations

from html import escape

_WORDS_PER_PARA = 12

_NAV = (
    '<nav class="menu"><ul>'
    '<li><a href="/">Home</a></li><li><a href="/news">News</a></li>'
    '<li><a href="/about">About us</a></li>'
    '<li><a href="/contact">Contact</a></li>'
    '<li><a href="/subscribe">Subscribe now</a></li></ul></nav>'
)
_SIDEBAR = (
    '<aside class="related"><div><a href="/a1">Related story one</a> '
    '<a href="/a2">Related story two</a> <a href="/a3">Trending now</a> '
    '<a href="/a4">Most read</a></div></aside>'
)
_LINKFARM = (
    '<div class="tags"><a href="/t/1">tag1</a> <a href="/t/2">tag2</a> '
    '<a href="/t/3">tag3</a> <a href="/t/4">tag4</a> '
    '<a href="/t/5">tag5</a></div>'
)
_FOOTER = (
    "<footer><p>Copyright 2026 Example Site. All rights reserved. "
    '<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
)


def chunk_words(text: str, k: int = _WORDS_PER_PARA) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i : i + k]) for i in range(0, len(words), k)]


def render_html(text: str, doc_id: int = 0, lang: str = "en",
                title: str = "") -> bytes:
    paras = "\n".join(
        f"<p>{escape(c)}</p>" for c in chunk_words(text) if c
    )
    title = title or f"Document {doc_id}"
    page = (
        "<!DOCTYPE html>\n"
        f'<html lang="{escape(lang)}"><head><meta charset="utf-8">'
        f"<title>{escape(title)}</title>"
        "<script>var x=1;</script><style>.menu{color:red}</style>"
        "</head><body>"
        f"<header>{_NAV}</header>"
        f"{_SIDEBAR}"
        f'<main><article>\n{paras}\n</article>{_LINKFARM}</main>'
        f"{_FOOTER}"
        "</body></html>"
    )
    return page.encode("utf-8")
