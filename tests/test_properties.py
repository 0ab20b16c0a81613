"""Property-based tests (hypothesis): the writer/tokenizer inverse
property (SURVEY.md §7.3 item 2), layout invariants, and renderer
totality on arbitrary inputs."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.datagen.pages import render_pdf_doc, wrap_words
from pdf_parser_spark.extractor import extract_document
from pdf_parser_spark.html.writer import render_html
from pdf_parser_spark.pdf import fonts
from pdf_parser_spark.pdf.tokenizer import parse_pdf
from pdf_parser_spark.pdf.writer import Page, Text, build_pdf

# words: printable ASCII, no whitespace, non-empty
_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=12)
_text = st.lists(_word, min_size=1, max_size=120).map(" ".join)


def norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


@settings(max_examples=40, deadline=None)
@given(_text, st.integers(min_value=1, max_value=10_000))
def test_pdf_roundtrip_property(text, doc_id):
    """For ANY word-sequence text, render -> tokenize -> layout ->
    extract preserves the token sequence exactly."""
    res = extract_document("u", render_pdf_doc(text, doc_id))
    assert res.error_kind is None
    assert norm(res.body_text) == norm(text)


@settings(max_examples=40, deadline=None)
@given(_text, st.integers(min_value=1, max_value=10_000))
def test_html_roundtrip_property(text, doc_id):
    res = extract_document("u", render_html(text, doc_id, "en"))
    assert res.error_kind is None
    assert norm(res.body_text) == norm(text)


@settings(max_examples=60, deadline=None)
@given(st.lists(_word, min_size=1, max_size=40).map(" ".join),
       st.integers(min_value=10, max_value=60))
def test_wrap_words_invariants(text, width):
    lines = wrap_words(text, width)
    # lossless: rejoining restores the text
    assert " ".join(lines) == text
    # no line exceeds width unless it is a single over-long word
    for ln in lines:
        assert len(ln) <= width or " " not in ln


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=64))
def test_pdf_string_escaping_roundtrip(s):
    """Writer escaping and tokenizer unescaping are inverse for any
    latin-1-encodable payload."""
    s = s.encode("latin-1", "replace").decode("latin-1")
    data = build_pdf([Page(texts=[Text(72, 700, s)])])
    spans = parse_pdf(data).pages[0].spans
    got = spans[0].text if spans else ""
    assert got == s


@settings(max_examples=40, deadline=None)
@given(_word, st.floats(min_value=4, max_value=40))
def test_text_width_additive(word, size):
    """Advance width is additive over concatenation (the invariant the
    span-gap space inference relies on)."""
    w1 = fonts.text_width(word, "Helvetica", size)
    w2 = fonts.text_width(word + word, "Helvetica", size)
    assert abs(w2 - 2 * w1) < 1e-9


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_extractor_total_on_garbage(data):
    """extract_document never raises, whatever the bytes."""
    res = extract_document("u", data)
    assert res.doc_type in ("pdf", "html", "unknown")
    # either extracted something or reported a structured error
    assert (res.text is not None) or res.error_kind


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000),
       st.integers(min_value=0, max_value=255),
       st.integers(min_value=1, max_value=64))
def test_extractor_survives_mutated_pdfs(seed, byte_val, n_mut):
    """Mutation fuzzing: corrupt a VALID PDF at pseudo-random offsets;
    extract_document must never raise (error column or degraded output,
    reference E1-E3 ladder)."""
    base = bytearray(render_pdf_doc("some words to corrupt here", 1))
    state = seed or 1
    for _ in range(n_mut):
        state = (1103515245 * state + 12345) % (2**31)
        base[state % len(base)] = byte_val
    res = extract_document("u", bytes(base))
    assert res.doc_type in ("pdf", "html", "unknown")
    assert (res.text is not None) or res.error_kind


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_extractor_survives_truncated_pdfs(cut):
    data = render_pdf_doc("truncate me please for robustness", 2)
    res = extract_document("u", data[: cut % len(data)])
    assert (res.text is not None) or res.error_kind


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000),
       st.integers(min_value=0, max_value=255),
       st.integers(min_value=1, max_value=48),
       st.sampled_from(["rc4-128", "aes-128", "aes-256"]))
def test_extractor_survives_mutated_encrypted_pdfs(seed, byte_val,
                                                   n_mut, method):
    """Mutation fuzzing over the DECRYPTION paths: corrupting /Encrypt
    dicts, O/U/OE/UE records or ciphertext must degrade to an error row
    or partial output — never an executor crash."""
    from pdf_parser_spark.pdf.writer import Page, Text, build_pdf

    base = bytearray(build_pdf(
        [Page(texts=[Text(72, 700, "secret words to corrupt")])],
        encrypt={"method": method, "user_pw": ""}))
    state = seed or 1
    for _ in range(n_mut):
        state = (1103515245 * state + 12345) % (2**31)
        base[state % len(base)] = byte_val
    res = extract_document("u", bytes(base))
    assert res.doc_type in ("pdf", "html", "unknown")
    assert (res.text is not None) or res.error_kind


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000),
       st.integers(min_value=0, max_value=255),
       st.integers(min_value=1, max_value=64))
def test_extractor_survives_mutated_html(seed, byte_val, n_mut):
    """Mutation fuzzing over the HTML path: corrupted tags, broken
    attributes, truncated entities — extract_document must degrade,
    never raise (the regex tokenizer and the density filters are both
    under test)."""
    base = bytearray(render_html("words to corrupt in the html body "
                                 "with several sentences", 3, "en"))
    state = seed or 1
    for _ in range(n_mut):
        state = (1103515245 * state + 12345) % (2**31)
        base[state % len(base)] = byte_val
    res = extract_document("u", bytes(base))
    assert res.doc_type in ("pdf", "html", "unknown")
    assert (res.text is not None) or res.error_kind


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_decode_real_total_on_garbage(data):
    """decode_real either returns validated metadata or raises
    NotImplementedError — never any other exception, never values
    outside int32 (the decode_media degrade contract relies on this)."""
    from pdf_parser_spark.analytics.multimodal import decode_real

    try:
        d = decode_real(data)
    except NotImplementedError:
        return
    assert d["format"] in ("bmp", "png", "gif", "pnm", "jpeg", "wav")
    for k in ("width", "height", "duration_ms"):
        v = d[k]
        assert v is None or 0 <= v < 2**31


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_decode_real_total_on_jpeg_prefixed_garbage(data):
    """The JPEG SOFn marker walk must terminate and degrade cleanly on
    arbitrary bytes behind a valid JPEG magic (no IndexError, no
    infinite loop, no out-of-range dims)."""
    from pdf_parser_spark.analytics.multimodal import decode_real

    try:
        d = decode_real(b"\xff\xd8\xff" + data)
    except NotImplementedError:
        return
    assert d["format"] == "jpeg"
    assert 0 < d["width"] < 2**31 and 0 < d["height"] < 2**31
