"""From-scratch PDF byte-stream tokenizer.

Replaces the reference's PyMuPDF ingestion (reference core/page.py:472-531
walks ``page.get_text("dict")``; core/document.py:57-162 opens via fitz).
Here the whole chain is pure Python + numpy so it can run inside Arrow
pandas UDFs on executors:

  bytes -> object graph (xref or full-scan fallback) -> page tree ->
  FlateDecode content streams -> text/path operator interpreter ->
  spans (top-left-origin bboxes, PyMuPDF convention, SURVEY.md §1.4)
  + line segments (for ruled-table lattice detection).

Output coordinate convention matches what the reference's layout stage
consumed from PyMuPDF: origin top-left, y increases DOWNWARD
(reference core/page.py:200). Path segments are likewise emitted top-left
(pdfplumber convention) so the table detector can flip them exactly like
the reference does (tables/detector.py:208-214).
"""

from __future__ import annotations

import math
import re
import zlib
from dataclasses import dataclass, field

from . import fonts


class PdfError(Exception):
    """Parse failure for one document (maps to the reference's
    PDFLoadError/PDFPageError hierarchy, core/exceptions.py:46-106).
    Callers catch this per-document and emit an error struct column —
    never a job abort."""


@dataclass(slots=True)
class Span:
    text: str
    x0: float
    y0: float  # top (smaller = higher on page)
    x1: float
    y1: float  # bottom
    font: str
    size: float
    bold: bool
    italic: bool
    color: tuple[int, int, int] = (0, 0, 0)


@dataclass(slots=True)
class Segment:
    """A stroked line segment in top-left coords."""

    x0: float
    y0: float
    x1: float
    y1: float


@dataclass
class PdfPage:
    number: int  # 1-based, reference convention (models.py:339-346)
    width: float
    height: float
    spans: list[Span] = field(default_factory=list)
    segments: list[Segment] = field(default_factory=list)


@dataclass
class PdfFile:
    pages: list[PdfPage]
    metadata: dict[str, str]


class Ref(tuple):
    """Indirect reference (num, gen)."""


class Name(str):
    """A PDF Name token (``/Foo``).

    Subclasses ``str`` so all existing comparisons/dict lookups work, but
    lets the decryption layer distinguish names from literal/hex strings:
    per ISO 32000 §7.6.2 names are NEVER encrypted, only strings are.
    (Reference delegates this distinction to PyMuPDF's object model.)
    """


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object lexer over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos
        self.n = len(data)

    _WS_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")

    def _skip_ws(self) -> None:
        # manual byte loop (r6): typical runs are 0-2 ws bytes, where a
        # regex call costs more than the skip itself; '%' comments drop
        # to the regex (which consumes any ws+comment run greedily)
        d, i, n = self.d, self.i, self.n
        while i < n:
            c = d[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # % comment
                m = self._WS_RE.match(d, i)
                i = m.end()
                break
            else:
                break
        self.i = i

    def parse(self):
        """Parse one object starting at self.i."""
        self._skip_ws()
        if self.i >= self.n:
            raise PdfError("unexpected EOF in object parse")
        d, i = self.d, self.i
        c = d[i]
        if c == 0x2F:  # /Name
            return self._name()
        # numbers/refs next: the second-most-common token after names
        if 0x30 <= c <= 0x39 or c == 0x2B or c == 0x2D or c == 0x2E:
            return self._number_or_ref()
        if c == 0x28:  # (string)
            return self._string()
        if c == 0x3C:  # << dict or <hex>
            if d[i + 1 : i + 2] == b"<":
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # [array]
            return self._array()
        if d[i : i + 4] == b"true":
            self.i += 4
            return True
        if d[i : i + 5] == b"false":
            self.i += 5
            return False
        if d[i : i + 4] == b"null":
            self.i += 4
            return None
        return self._number_or_ref()

    _NAME_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
    _NAME_CACHE: dict[bytes, "Name"] = {}

    def _name(self) -> str:
        self.i += 1
        m = self._NAME_RE.match(self.d, self.i)
        run = m.group(0)
        self.i = m.end()
        # names repeat massively across documents (/Type /Page /Font
        # /Contents ...) — a worker-lifetime memo of the decoded Name
        # skips the decode+alloc (values are immutable interned tokens)
        got = _Lexer._NAME_CACHE.get(run)
        if got is not None:
            return got
        if b"#" in run:  # rare #xx escapes
            out = bytearray()
            j = 0
            while j < len(run):
                if run[j] == 0x23 and j + 2 < len(run):
                    out.append(int(run[j + 1 : j + 3], 16))
                    j += 3
                else:
                    out.append(run[j])
                    j += 1
            name = Name(out.decode("latin-1"))
        else:
            name = Name(run.decode("latin-1"))
        cache = _Lexer._NAME_CACHE
        if len(cache) > 4096:
            cache.clear()
        cache[run] = name
        return name

    _SIMPLE_STR_RE = re.compile(rb"\(([^()\\]*)\)")

    def _string(self) -> str:
        # fast path: no escapes, no nesting (the overwhelmingly common
        # case for show-text operands)
        m = self._SIMPLE_STR_RE.match(self.d, self.i)
        if m:
            self.i = m.end()
            return m.group(1).decode("latin-1")
        d = self.d
        i = self.i + 1
        depth = 1
        out = bytearray()
        while i < self.n and depth:
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                e = d[i]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal
                    k = i
                    while k < i + 3 and k < self.n and 0x30 <= d[k] <= 0x37:
                        k += 1
                    out.append(int(d[i:k], 8) & 0xFF)
                    i = k
                elif e == 0x0A:
                    i += 1  # line continuation
                else:
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth:
                    out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.i = i
        return out.decode("latin-1")

    def _hex_string(self) -> str:
        j = self.d.find(b">", self.i)
        if j < 0:
            raise PdfError("unterminated hex string")
        hx = re.sub(rb"\s", b"", self.d[self.i + 1 : j])
        if len(hx) % 2:
            hx += b"0"
        self.i = j + 1
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")

    def _dict(self) -> dict:
        self.i += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.d[self.i : self.i + 2] == b">>":
                self.i += 2
                return out
            key = self.parse()
            val = self.parse()
            if isinstance(key, str):
                out[key] = val

    def _array(self) -> list:
        self.i += 1
        out: list = []
        while True:
            self._skip_ws()
            if self.i < self.n and self.d[self.i] == 0x5D:
                self.i += 1
                return out
            out.append(self.parse())

    _NUM = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
    _REF = re.compile(rb"(\d+)\s+(\d+)\s+R\b")

    def _number_or_ref(self):
        m = self._REF.match(self.d, self.i)
        if m:
            self.i = m.end()
            return Ref((int(m.group(1)), int(m.group(2))))
        m = self._NUM.match(self.d, self.i)
        if not m:
            raise PdfError(f"bad token at offset {self.i}")
        self.i = m.end()
        tok = m.group(0)
        return float(tok) if b"." in tok else int(tok)


def _lzw_decode(raw: bytes, early_change: int = 1) -> bytes:
    """LZWDecode (PDF spec 7.4.4: TIFF-style LZW, MSB-first variable-width
    codes 9-12 bits, clear=256, EOD=257, EarlyChange default 1)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in raw:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise PdfError(f"bad LZW code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EarlyChange=1 bumps at table len 511/1023/2047 (one entry
            # before the width is exhausted; pdfminer/pdf.js-compatible),
            # EarlyChange=0 at 512/1024/2048.
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _rle_decode(raw: bytes) -> bytes:
    """RunLengthDecode (PDF spec 7.4.5)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        l = raw[i]
        if l == 128:
            break
        if l < 128:
            out += raw[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            out += raw[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _png_unpredict(raw: bytes, columns: int, bpp: int = 1) -> bytes:
    """Undo PNG row predictors (PDF /Predictor >= 10; spec 7.4.4.4).
    Each row is prefixed by a filter-type byte; real-world xref streams
    use Up (2) almost exclusively, but all five types are handled."""
    row_len = columns * bpp
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    while i + 1 + row_len <= len(raw) + row_len and i < len(raw):
        ft = raw[i]
        row = bytearray(raw[i + 1 : i + 1 + row_len])
        row += bytes(row_len - len(row))
        i += 1 + row_len
        if ft == 1:     # Sub
            for k in range(bpp, row_len):
                row[k] = (row[k] + row[k - bpp]) & 0xFF
        elif ft == 2:   # Up
            for k in range(row_len):
                row[k] = (row[k] + prev[k]) & 0xFF
        elif ft == 3:   # Average
            for k in range(row_len):
                left = row[k - bpp] if k >= bpp else 0
                row[k] = (row[k] + ((left + prev[k]) >> 1)) & 0xFF
        elif ft == 4:   # Paeth
            for k in range(row_len):
                a = row[k - bpp] if k >= bpp else 0
                b = prev[k]
                c = prev[k - bpp] if k >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[k] = (row[k] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _apply_predictor(raw: bytes, parms) -> bytes:
    if not isinstance(parms, dict):
        return raw
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, (int, float)) or pred < 2:
        return raw
    columns = int(parms.get("Columns", 1) or 1)
    colors = int(parms.get("Colors", 1) or 1)
    bpc = int(parms.get("BitsPerComponent", 8) or 8)
    bpp = max(1, colors * bpc // 8)
    if pred == 2:  # TIFF horizontal differencing (8-bit components)
        out = bytearray(raw)
        row_len = columns * bpp
        for r0 in range(0, len(out) - row_len + 1, row_len):
            for k in range(bpp, row_len):
                out[r0 + k] = (out[r0 + k] + out[r0 + k - bpp]) & 0xFF
        return bytes(out)
    return _png_unpredict(raw, columns, bpp)


def _apply_filters(raw: bytes, filters: list, parms_list=None) -> bytes:
    """Decode a stream filter chain: Flate, ASCIIHex, ASCII85, RunLength
    (the text-bearing set; image codecs like DCT are not text streams)."""
    import base64

    if parms_list is None:
        parms_list = [None] * len(filters)
    for f, parms in zip(filters, parms_list):
        if f is None:
            continue
        if f in ("FlateDecode", "Fl"):
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise PdfError(f"FlateDecode failed: {e}") from e
            raw = _apply_predictor(raw, parms)
        elif f in ("ASCIIHexDecode", "AHx"):
            hx = re.sub(rb"[\s>]", b"", raw)
            if len(hx) % 2:
                hx += b"0"
            try:
                raw = bytes.fromhex(hx.decode("ascii"))
            except ValueError as e:
                raise PdfError(f"ASCIIHexDecode failed: {e}") from e
        elif f in ("ASCII85Decode", "A85"):
            body = re.sub(rb"\s", b"", raw)
            if body.endswith(b"~>"):
                body = body[:-2]
            try:
                raw = base64.a85decode(body, adobe=False)
            except ValueError as e:
                raise PdfError(f"ASCII85Decode failed: {e}") from e
        elif f in ("RunLengthDecode", "RL"):
            raw = _rle_decode(raw)
        elif f in ("LZWDecode", "LZW"):
            ec = 1
            if isinstance(parms, dict):
                v = parms.get("EarlyChange", 1)
                if isinstance(v, (int, float)):
                    ec = int(v)
            raw = _lzw_decode(raw, ec)
            raw = _apply_predictor(raw, parms)
        else:
            raise PdfError(f"unsupported filter {f!r}")
    return raw


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


_XREF_ENTRY_RE = re.compile(rb"(\d{10}) (\d{5}) ([nf])")


class _Doc:
    """Parsed object store with lazy stream decoding.

    Object index comes from the xref table when intact (startxref ->
    subsection walk, reference core/document.py relies on the library
    doing this); falls back to a full byte scan like real-world repair
    parsers when the xref is damaged."""

    def __init__(self, data: bytes, password: str | None = None):
        if not data:
            raise PdfError("empty bytes")
        if b"%PDF-" not in data[:1024]:
            raise PdfError("missing %PDF- header")
        self.data = data
        # objects living inside /Type /ObjStm streams: num -> (stm_num, idx)
        self.compressed: dict[int, tuple[int, int]] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._xref_trailer: dict | None = None
        self._crypt = None
        self._cache: dict[int, object] = {}
        self.objs: dict[int, int] = (self._parse_xref()
                                     or self._parse_xref_stream()
                                     or self._scan_objects())
        if not self.objs and not self.compressed:
            raise PdfError("no indirect objects found")
        self.trailer = self._xref_trailer or self._find_trailer()
        if isinstance(self.trailer, dict) and "Encrypt" in self.trailer:
            self._setup_decryption(password)

    def _setup_decryption(self, password: str | None) -> None:
        """Standard security handler (reference core/document.py:109-123
        semantics: decrypt on load; distinct errors for 'no password' vs
        'invalid password'). PDFs whose USER password is empty — the
        most common encrypted corpus case — authenticate with no
        password supplied, exactly like PyMuPDF's open-time attempt."""
        from . import crypto

        enc_ref = self.trailer.get("Encrypt")
        self._encrypt_num = enc_ref[0] if isinstance(enc_ref, Ref) else -1
        enc = self.obj(enc_ref)
        if not isinstance(enc, dict):
            raise PdfError("document is encrypted (malformed /Encrypt)")
        ids = self.obj(self.trailer.get("ID"))
        id0 = b""
        if isinstance(ids, list) and ids and isinstance(ids[0], str):
            id0 = ids[0].encode("latin-1")
        try:
            handler = crypto.StandardSecurityHandler(enc, id0)
        except ValueError as e:
            raise PdfError(f"document is encrypted ({e})") from e
        pw = (password or "").encode("latin-1")
        if not handler.authenticate(pw):
            if password is None:
                raise PdfError(
                    "document is encrypted (no password provided)")
            raise PdfError("invalid password for encrypted PDF")
        self._cache.clear()  # anything resolved pre-auth lacks decryption
        self._crypt = handler

    def _decrypt_strings(self, val, num: int, gen: int):
        """Recursively decrypt string leaves of a direct object.

        Names are skipped: ISO 32000 §7.6.2 — encryption applies to
        strings and streams only, never to name objects (/BaseFont,
        /Differences glyph names, /Type values must survive intact).
        """
        if isinstance(val, Name):
            return val
        if isinstance(val, str):
            raw = self._crypt.decrypt(val.encode("latin-1"), num, gen,
                                      string=True)
            return raw.decode("latin-1")
        if isinstance(val, list):
            return [self._decrypt_strings(v, num, gen) for v in val]
        if isinstance(val, dict):
            return {k: self._decrypt_strings(v, num, gen)
                    for k, v in val.items()}
        return val

    def _parse_xref(self) -> dict[int, int] | None:
        """Classic xref table: startxref offset -> 'xref' subsections,
        following the trailer /Prev chain through incremental updates
        (newest section wins per object — an updated doc's old sections
        hold the UNCHANGED objects, so skipping the chain loses them).
        The LAST startxref in the file is the live one (§7.5.5; a small
        incremental update can leave the previous one inside the tail
        window too). Returns object-number -> offset-AFTER-'obj' map,
        or None."""
        tail = self.data[-256:]
        starts = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not starts:
            return None
        try:
            pos = int(starts[-1].group(1))
        except ValueError:
            return None
        objs: dict[int, int] = {}
        freed: set[int] = set()
        seen: set[int] = set()
        while pos and pos not in seen and 0 < pos < len(self.data):
            seen.add(pos)
            if self.data[pos : pos + 4] != b"xref":
                # xref stream (PDF 1.5+) or damage: fall back (a mixed
                # classic/stream chain is handled by _parse_xref_stream)
                return None
            section, section_freed, prev = self._parse_xref_section(
                pos + 4)
            if section is None:
                return None
            for num, off in section.items():
                if num not in freed:  # deleted in a NEWER section stays
                    objs.setdefault(num, off)  # ...deleted; newest wins
            freed |= section_freed
            pos = prev
        return objs or None

    def _parse_xref_section(
            self, i: int,
    ) -> tuple[dict[int, int] | None, set[int], int]:
        """One classic xref section starting after the 'xref' keyword:
        returns (live entries, freed object numbers, /Prev offset or 0);
        (None, set(), 0) on damage. Freed ('f') entries are reported so
        the /Prev walk can stop an OLDER section resurrecting an object
        an incremental update deleted (§7.5.4: the newest entry for an
        object number is authoritative, including type-f)."""
        objs: dict[int, int] = {}
        freed: set[int] = set()
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*", self.data[i : i + 40])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            i += m.end()
            for k in range(count):
                e = _XREF_ENTRY_RE.match(self.data, i)
                if not e:
                    return None, set(), 0  # malformed: distrust table
                i += 20
                if e.group(3) == b"n":
                    off = int(e.group(1))
                    om = _OBJ_RE.match(self.data, off)
                    if om is None or int(om.group(1)) != start + k:
                        return None, set(), 0  # stale: fall back to scan
                    objs[start + k] = om.end()
                else:
                    freed.add(start + k)
        prev = 0
        tm = re.match(rb"\s*trailer\s*", self.data[i : i + 40])
        if tm:
            try:
                td = _Lexer(self.data, i + tm.end()).parse()
            except PdfError:
                td = None
            if isinstance(td, dict) and isinstance(td.get("Prev"), int):
                prev = td["Prev"]
        return objs, freed, prev

    def _parse_xref_stream(self) -> dict[int, int] | None:
        """PDF 1.5+ cross-reference STREAM (/Type /XRef): binary entry
        rows of /W-sized fields; type-2 entries point into /Type /ObjStm
        object streams. Follows /Prev chains."""
        tail = self.data[-256:]
        starts = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not starts:
            return None
        objs: dict[int, int] = {}
        freed: set[int] = set()  # type-0 in a newer section = deleted
        pos = int(starts[-1].group(1))  # the LAST startxref is live
        seen: set[int] = set()
        while pos and pos not in seen and 0 < pos < len(self.data):
            seen.add(pos)
            om = _OBJ_RE.match(self.data, pos)
            if not om:
                return None
            lex = _Lexer(self.data, om.end())
            try:
                d = lex.parse()
            except PdfError:
                return None
            if not isinstance(d, dict) or d.get("Type") != "XRef":
                return None
            if self._xref_trailer is None:
                self._xref_trailer = d
            try:
                raw = self._stream_at(om.end(), d)
            except PdfError:
                return None
            w = d.get("W")
            if not (isinstance(w, list) and len(w) >= 3):
                return None
            w0, w1, w2 = (int(x) for x in w[:3])
            size = int(d.get("Size", 0))
            index = d.get("Index") or [0, size]
            entry_len = w0 + w1 + w2
            off = 0

            def field(buf: bytes, start: int, width: int,
                      default: int) -> int:
                if width == 0:
                    return default
                return int.from_bytes(buf[start : start + width], "big")

            for k in range(0, len(index) - 1, 2):
                first, count = int(index[k]), int(index[k + 1])
                for i in range(count):
                    if off + entry_len > len(raw):
                        break
                    typ = field(raw, off, w0, 1)
                    f2 = field(raw, off + w0, w1, 0)
                    f3 = field(raw, off + w0 + w1, w2, 0)
                    num = first + i
                    off += entry_len
                    if (num in objs or num in self.compressed
                            or num in freed):
                        continue  # newest xref section wins (incl. free)
                    if typ == 1:
                        am = _OBJ_RE.match(self.data, f2)
                        if am and int(am.group(1)) == num:
                            objs[num] = am.end()
                    elif typ == 2:
                        self.compressed[num] = (f2, f3)
                    elif typ == 0:
                        freed.add(num)  # stop older sections reviving it
            prev = d.get("Prev")
            pos = int(prev) if isinstance(prev, (int, float)) else 0
        return objs or (dict() if self.compressed else None)

    def _stream_at(self, dict_pos: int, d: dict,
                   crypt_num: int | None = None) -> bytes:
        """Decode the stream whose dict starts at ``dict_pos`` (already
        parsed as ``d``). ``crypt_num``: object number for decryption
        (None = never encrypted, e.g. XRef streams)."""
        lex = _Lexer(self.data, dict_pos)
        lex.parse()  # skip past the dict
        lex._skip_ws()
        if self.data[lex.i : lex.i + 6] != b"stream":
            raise PdfError("expected 'stream' keyword")
        i = lex.i + 6
        if self.data[i : i + 2] == b"\r\n":
            i += 2
        elif self.data[i : i + 1] in (b"\n", b"\r"):
            i += 1
        length = d.get("Length")
        if isinstance(length, Ref):
            length = None  # resolving here could recurse; use endstream
        if isinstance(length, (int, float)):
            raw = self.data[i : i + int(length)]
        else:
            j = self.data.find(b"endstream", i)
            if j < 0:
                raise PdfError("unterminated stream")
            raw = self.data[i:j].rstrip(b"\r\n")
        if self._crypt is not None and crypt_num is not None:
            raw = self._crypt.decrypt(raw, crypt_num, 0)
        filt = d.get("Filter")
        filters = [filt] if isinstance(filt, str) else (filt or [])
        parms = d.get("DecodeParms")
        parms_list = ([parms] if isinstance(parms, dict)
                      else [p for p in parms] if isinstance(parms, list)
                      else None)
        return _apply_filters(raw, filters, parms_list)

    def _load_objstm(self, stm_num: int) -> dict[int, object]:
        """Parse a /Type /ObjStm: header of (objnum, offset) pairs, then
        the serialized objects at /First + offset."""
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        pos = self.objs.get(stm_num)
        if pos is None:
            raise PdfError(f"object stream {stm_num} missing")
        lex = _Lexer(self.data, pos)
        d = lex.parse()
        if not isinstance(d, dict) or d.get("Type") != "ObjStm":
            raise PdfError(f"object {stm_num} is not an ObjStm")
        raw = self._stream_at(pos, d, crypt_num=stm_num)
        n = int(self.obj(d.get("N")) or 0)
        first = int(self.obj(d.get("First")) or 0)
        header = _Lexer(raw[:first])
        out: dict[int, object] = {}
        pairs = []
        for _ in range(n):
            num = header.parse()
            off = header.parse()
            pairs.append((int(num), int(off)))
        for num, off in pairs:
            try:
                out[num] = _Lexer(raw, first + off).parse()
            except PdfError:
                out[num] = None
        self._objstm_cache[stm_num] = out
        return out

    def _scan_objects(self) -> dict[int, int]:
        objs: dict[int, int] = {}
        for m in _OBJ_RE.finditer(self.data):
            objs[int(m.group(1))] = m.end()
        return objs

    def _find_trailer(self) -> dict:
        i = self.data.rfind(b"trailer")
        while i >= 0:
            j = self.data.find(b"<<", i)
            if j >= 0:
                try:
                    return _Lexer(self.data, j).parse()  # type: ignore[return-value]
                except Exception:
                    pass
            i = self.data.rfind(b"trailer", 0, i)
        return {}

    def obj(self, ref):
        """Resolve an object (follows one level of indirection; objects
        inside /Type /ObjStm streams resolved transparently)."""
        if isinstance(ref, Ref):
            num = ref[0]
            if num in self._cache:
                return self._cache[num]
            pos = self.objs.get(num)
            if pos is None:
                loc = self.compressed.get(num)
                if loc is None:
                    return None
                try:
                    val = self._load_objstm(loc[0]).get(num)
                except PdfError:
                    val = None
                self._cache[num] = val
                return val
            val = _Lexer(self.data, pos).parse()
            if self._crypt is not None and num != getattr(
                    self, "_encrypt_num", -1):
                # strings of direct objects are individually encrypted;
                # ObjStm members are not (their container stream was)
                val = self._decrypt_strings(val, num, ref[1])
            self._cache[num] = val
            return val
        return ref

    def stream(self, ref) -> bytes:
        """Decoded stream bytes of an indirect stream object."""
        if not isinstance(ref, Ref):
            raise PdfError("stream target must be an indirect ref")
        pos = self.objs.get(ref[0])
        if pos is None:
            raise PdfError(f"missing stream object {ref[0]}")
        lex = _Lexer(self.data, pos)
        d = lex.parse()
        if not isinstance(d, dict):
            raise PdfError("stream object lacks a dict")
        lex._skip_ws()
        if self.data[lex.i : lex.i + 6] != b"stream":
            raise PdfError("expected 'stream' keyword")
        i = lex.i + 6
        if self.data[i : i + 2] == b"\r\n":
            i += 2
        elif self.data[i : i + 1] in (b"\n", b"\r"):
            i += 1
        length = self.obj(d.get("Length"))
        if isinstance(length, (int, float)):
            raw = self.data[i : i + int(length)]
        else:
            j = self.data.find(b"endstream", i)
            if j < 0:
                raise PdfError("unterminated stream")
            raw = self.data[i:j].rstrip(b"\r\n")
        if self._crypt is not None:
            raw = self._crypt.decrypt(raw, ref[0], ref[1])
        filt = self.obj(d.get("Filter"))
        filters = [filt] if isinstance(filt, str) else (filt or [])
        parms = self.obj(d.get("DecodeParms"))
        parms_list = ([parms] if isinstance(parms, dict)
                      else [self.obj(p) for p in parms]
                      if isinstance(parms, list) else None)
        return _apply_filters(raw, filters, parms_list)


# -- font decoding: /Encoding /Differences + /ToUnicode CMaps ---------------

# Minimal Adobe-glyph-list subset for /Differences fixtures/real files.
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotesingle": "'", "quotedbl": '"',
    "bullet": "•", "emdash": "—", "endash": "–",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "uumlaut": "ü", "udieresis": "ü",
    "odieresis": "ö", "adieresis": "ä", "germandbls": "ß",
    "Euro": "€", "copyright": "©", "degree": "°",
    "plusminus": "±", "onehalf": "½", "ellipsis": "…",
    "quoteright": "’", "quoteleft": "‘",
    "quotedblleft": "“", "quotedblright": "”",
}

_BFCHAR_RE = re.compile(
    rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(
    rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
# bfrange body tokenizer: hex string, '[' or ']' (the array-destination
# form 'lo hi [d1 d2 ...]' needs real parsing — flat zip-by-3 misaligns
# every range after the first array)
_BFTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """bfchar/bfrange sections of a /ToUnicode CMap -> code -> str.
    Supports 1-2 byte source codes and UTF-16BE destinations."""
    out: dict[int, str] = {}

    def _dst(hx: bytes) -> str:
        raw = bytes.fromhex(hx.decode("ascii"))
        if len(raw) % 2 == 0:
            try:
                return raw.decode("utf-16-be")
            except UnicodeDecodeError:
                pass
        return raw.decode("latin-1")

    for m in _BFCHAR_RE.finditer(cmap):
        pairs = _HEXPAIR_RE.findall(m.group(1))
        for src, dst in zip(pairs[0::2], pairs[1::2]):
            out[int(src, 16)] = _dst(dst)
    for m in _BFRANGE_RE.finditer(cmap):
        toks = [(t.group(1), t.group(2) is not None, t.group(3) is not None)
                for t in _BFTOK_RE.finditer(m.group(1))]
        j = 0
        n_toks = len(toks)
        while j + 1 < n_toks:
            lo, hi = toks[j][0], toks[j + 1][0]
            if lo is None or hi is None:
                j += 1  # desynced (stray bracket): resync forward
                continue
            j += 2
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if j < n_toks and toks[j][1]:  # '[': one dst per code
                j += 1
                k = 0
                while j < n_toks and not toks[j][2]:
                    if toks[j][0] is not None and k <= 255:
                        out[lo_i + k] = _dst(toks[j][0])
                        k += 1
                    j += 1
                j += 1  # skip ']'
            elif j < n_toks and toks[j][0] is not None:
                dst = toks[j][0]
                j += 1
                base = int(dst, 16)
                width = len(dst)
                for c in range(lo_i, min(hi_i, lo_i + 255) + 1):
                    out[c] = _dst(b"%0*X" % (width, base + (c - lo_i)))
            else:
                break  # truncated range
    return out


class FontDecode:
    """Per-font byte -> text decoding: base latin-1, overridden by
    /Encoding /Differences glyph names, overridden by /ToUnicode.

    ``two_byte=True`` (Type0/CID fonts, Identity-H): show-string bytes are
    2-byte CIDs; text comes from the /ToUnicode CMap and advances from the
    descendant font's /W widths (default /DW 1000)."""

    __slots__ = ("base_font", "table", "two_byte", "cid_widths",
                 "default_width")

    def __init__(self, base_font: str,
                 differences: dict[int, str] | None = None,
                 to_unicode: dict[int, str] | None = None,
                 two_byte: bool = False,
                 cid_widths: dict[int, float] | None = None,
                 default_width: float = 1000.0):
        self.base_font = base_font
        self.two_byte = two_byte
        self.cid_widths = cid_widths or {}
        self.default_width = default_width
        table: dict[int, str] | None = None
        if differences:
            table = {code: _GLYPH_NAMES.get(name, "�")
                     for code, name in differences.items()}
        if to_unicode:
            table = dict(table or {})
            table.update(to_unicode)
        self.table = table

    def codes(self, raw: str) -> list[int]:
        if not self.two_byte:
            return [ord(ch) for ch in raw]
        b = raw.encode("latin-1", "replace")
        return [int.from_bytes(b[i : i + 2], "big")
                for i in range(0, len(b) - len(b) % 2, 2)]

    def decode(self, raw: str) -> str:
        if self.two_byte:
            t = self.table or {}
            return "".join(t.get(c, "�") for c in self.codes(raw))
        if self.table is None:
            return raw
        t = self.table
        return "".join(t.get(ord(ch), ch) for ch in raw)

    def advance(self, raw: str, size: float, tc: float, tw: float) -> float:
        """Text-space advance width; CID path uses /W widths."""
        if not self.two_byte:
            return fonts.text_width(raw, self.base_font, size, tc, tw)
        cids = self.codes(raw)
        w = sum(self.cid_widths.get(c, self.default_width) for c in cids)
        return w * size / 1000.0 + tc * len(cids)


# -- content-stream interpretation -------------------------------------------

_CS_WS_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")

# r6: fused ws-skip + token pattern — ONE regex call per token (the old
# loop paid a ws match plus a token match each); group index = kind.
_CS_SCAN = re.compile(
    rb"""(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*
      (?:\(([^()\\]*)\)               # 1: literal string (simple)
       |  /([^\s()<>\[\]{}/%]*)       # 2: name
       |  <([0-9A-Fa-f\s]*)>          # 3: hex string
       |  ([+-]?(?:\d+\.?\d*|\.\d+))  # 4: number
       |  ([\[\]])                    # 5: array delimiter
       |  ([A-Za-z'"*]+)              # 6: operator
      )""",
    re.VERBOSE,
)


def _cs_tokens(data: bytes):
    """Tokenize a content stream. Nested-paren strings are rare in our
    subset; fall back to the object lexer for those."""
    i, n = 0, len(data)
    scan = _CS_SCAN.match
    while i < n:
        m = scan(data, i)
        if m is not None:
            li = m.lastindex
            i = m.end()
            if li == 4:
                yield ("num", float(m.group(4)))
            elif li == 1:
                yield ("str", m.group(1).decode("latin-1"))
            elif li == 2:
                yield ("name", m.group(2).decode("latin-1"))
            elif li == 6:
                tok = m.group(6)
                if tok == b"BI":
                    # inline image: skip dict to ID, then binary payload
                    # to a whitespace-delimited EI (PDF spec 8.9.7) — the
                    # payload must not reach the tokenizer
                    j = data.find(b"ID", i)
                    if j < 0:
                        return
                    m2 = re.search(
                        rb"[\x00\t\n\x0c\r ]EI"
                        rb"(?=[\x00\t\n\x0c\r /\[\]<>(%]|$)",
                        data[j + 2 :])
                    if not m2:
                        return
                    i = j + 2 + m2.end()
                else:
                    yield ("op", tok.decode("latin-1"))
            elif li == 5:
                yield ("arr", m.group(5))
            else:  # 3: hex string
                hx = re.sub(rb"\s", b"", m.group(3))
                if len(hx) % 2:
                    hx += b"0"
                yield ("str", bytes.fromhex(hx.decode()).decode("latin-1"))
            continue
        # no token match: trailing ws, a complex (escaped/nested)
        # string, or a junk byte
        mw = _CS_WS_RE.match(data, i)
        if mw:
            i = mw.end()
            continue
        if data[i] == 0x28:
            lex = _Lexer(data, i)
            yield ("str", lex._string())
            i = lex.i
            continue
        i += 1  # skip junk byte (degrade, don't die: reference E3)


def _parse_cid_widths(w: list) -> dict[int, float]:
    """CIDFont /W array: two forms — ``c [w1 w2 ...]`` and
    ``c_first c_last w`` (PDF spec 9.7.4.3)."""
    out: dict[int, float] = {}
    i = 0
    while i < len(w):
        if i + 1 < len(w) and isinstance(w[i + 1], list):
            start = int(w[i])
            for k, width in enumerate(w[i + 1]):
                out[start + k] = float(width)
            i += 2
        elif i + 2 < len(w):
            for c in range(int(w[i]), int(w[i + 1]) + 1):
                out[c] = float(w[i + 2])
            i += 3
        else:
            break
    return out


_DEFAULT_DECODE = FontDecode("Helvetica")


def _interpret(content: bytes, page: PdfPage,
               font_map: dict[str, FontDecode]) -> None:
    """Execute text/path operators, appending spans and segments to
    ``page``. Coordinates arrive in PDF space (bottom-left origin) and are
    emitted top-left (SURVEY.md §1.4).

    Full 2x3 affine matrices are honored for Tm and cm (rotation/skew
    included — the reference gets these free from PyMuPDF's get_text,
    core/page.py:480): a span's device bbox is the axis-aligned envelope
    of its four transformed text-space corners, exact for the 90-degree
    rotations real documents use (headers, watermarks, sideways table
    labels). Fill color (rg/g/k) is tracked in the graphics state and
    emitted per span as 0-255 RGB (reference core/page.py:746-755)."""
    H = page.height
    # text state
    font_id = next(iter(font_map), "F1")
    size = 12.0
    tx = ty = 0.0           # current text position (text space)
    lx = ly = 0.0           # line start (text space)
    leading = 0.0
    tc = tw = 0.0
    # text matrix Tm = (a b c d e f): (x,y) -> (a*x+c*y+e, b*x+d*y+f)
    ta, tb, tcm, td_, te, tf = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0
    # graphics state: full CTM + fill color, q/Q stack
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    rmat = None      # cached Tm x CTM; invalidated on Tm/cm/Q/BT
    fill = (0, 0, 0)
    gs_stack: list[tuple[tuple, tuple[int, int, int]]] = []
    stack: list = []        # operand stack
    in_array: list | None = None
    # path state
    cx = cy = 0.0
    subpath: list[Segment] = []
    pending: list[Segment] = []

    def show(s: str, at_x: float, at_y: float) -> float:
        """Emit a span for text at (at_x, at_y) in TEXT space; returns the
        text-space advance."""
        fd = font_map.get(font_id, _DEFAULT_DECODE)
        if isinstance(fd, str):  # convenience for direct _interpret use
            fd = FontDecode(fd)
        base = fd.base_font
        # glyph advance comes from the RAW byte codes; the emitted text is
        # the CMap/Differences-decoded string
        w = fd.advance(s, size, tc, tw)
        if s:
            _, asc, desc = fonts.metrics(base)
            nonlocal rmat
            if rmat is None:
                # render matrix R = Tm x CTM (row-vector convention);
                # changes only on Tm/cm/Q/BT, so it is cached across the
                # (typically many) show ops between matrix mutations
                ca, cb, cc, cd, ce, cf = ctm
                rmat = (ta * ca + tb * cc, ta * cb + tb * cd,
                        tcm * ca + td_ * cc, tcm * cb + td_ * cd,
                        te * ca + tf * cc + ce, te * cb + tf * cd + cf)
            ra, rb, rc, rd, re_, rf = rmat
            xs0, xs1 = at_x, at_x + w
            yb, yt = at_y + desc * size, at_y + asc * size
            if rb == 0.0 and rc == 0.0 and ra > 0.0 and rd > 0.0:
                # fast path: the overwhelmingly common unrotated,
                # positive-scale case — same values as the general
                # envelope below, ~3x fewer flops per span
                eff_size = size * rd
                min_x, max_x = ra * xs0 + re_, ra * xs1 + re_
                min_y, max_y = rd * yb + rf, rd * yt + rf
            else:
                # effective size = magnitude of the y-axis image
                eff_size = size * math.hypot(rc, rd)
                # device bbox = envelope of the 4 text-space corners
                corners = ((xs0, yb), (xs1, yb), (xs0, yt), (xs1, yt))
                dev = [(ra * x + rc * y + re_, rb * x + rd * y + rf)
                       for x, y in corners]
                min_x = min(p[0] for p in dev)
                max_x = max(p[0] for p in dev)
                min_y = min(p[1] for p in dev)
                max_y = max(p[1] for p in dev)
            page.spans.append(Span(
                text=fd.decode(s),
                x0=min_x,
                y0=H - max_y,
                x1=max_x,
                y1=H - min_y,
                font=base,
                size=eff_size,
                bold=fonts.is_bold(base),
                italic=fonts.is_italic(base),
                color=fill,
            ))
        return w

    def seg(x0: float, y0: float, x1: float, y1: float) -> None:
        ca, cb, cc, cd, ce, cf = ctm
        subpath.append(Segment(
            ca * x0 + cc * y0 + ce, H - (cb * x0 + cd * y0 + cf),
            ca * x1 + cc * y1 + ce, H - (cb * x1 + cd * y1 + cf)))

    def _rgb255(r: float, g: float, b: float) -> tuple[int, int, int]:
        clamp = lambda v: max(0, min(255, int(round(v * 255.0))))
        return (clamp(r), clamp(g), clamp(b))

    for kind, val in _cs_tokens(content):
        if in_array is not None:
            if kind == "arr" and val == b"]":
                arr, in_array = in_array, None
                stack.append(arr)
            else:
                in_array.append((kind, val))
            continue
        if kind == "arr" and val == b"[":
            in_array = []
            continue
        if kind != "op":
            stack.append((kind, val))
            continue

        op = val
        try:
            # hottest ops first (one Tj+Td pair per text line dominates)
            if op == "Tj" and stack:
                tx += show(str(stack[-1][1]), tx, ty)
            elif op == "Td" and len(stack) >= 2:
                lx += float(stack[-2][1])
                ly += float(stack[-1][1])
                tx, ty = lx, ly
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                for k, v in stack[-1]:
                    if k == "str":
                        tx += show(str(v), tx, ty)
                    elif k == "num":
                        tx -= float(v) / 1000.0 * size
            elif op == "Tf" and len(stack) >= 2:
                size = float(stack[-1][1])
                font_id = stack[-2][1]
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1][1])
                lx += float(stack[-2][1])
                ly += float(stack[-1][1])
                tx, ty = lx, ly
            elif op == "Tm" and len(stack) >= 6:
                ta = float(stack[-6][1])
                tb = float(stack[-5][1])
                tcm = float(stack[-4][1])
                td_ = float(stack[-3][1])
                te = float(stack[-2][1])
                tf = float(stack[-1][1])
                if ta == tb == tcm == td_ == 0.0:
                    ta = td_ = 1.0  # degenerate matrix: treat as identity
                rmat = None
                lx = ly = 0.0
                tx, ty = lx, ly
            elif op == "T*":
                ly -= leading
                tx, ty = lx, ly
            elif op == "TL" and stack:
                leading = float(stack[-1][1])
            elif op == "Tc" and stack:
                tc = float(stack[-1][1])
            elif op == "Tw" and stack:
                tw = float(stack[-1][1])
            elif op == "BT":
                tx = ty = lx = ly = 0.0
                ta, tb, tcm, td_ = 1.0, 0.0, 0.0, 1.0
                te = tf = 0.0
                rmat = None
            elif op == "q":
                gs_stack.append((ctm, fill))
            elif op == "Q":
                if gs_stack:
                    ctm, fill = gs_stack.pop()
                    rmat = None
            elif op == "cm" and len(stack) >= 6:
                # CTM' = M x CTM: device p = ctm(m(p)), full 2x3 concat
                ma, mb, mc, md, me, mf = (
                    float(stack[j][1]) for j in range(-6, 0))
                if ma == mb == mc == md == 0.0:
                    ma = md = 1.0  # degenerate matrix: treat as identity
                ca, cb, cc, cd, ce, cf = ctm
                ctm = (ma * ca + mb * cc, ma * cb + mb * cd,
                       mc * ca + md * cc, mc * cb + md * cd,
                       me * ca + mf * cc + ce, me * cb + mf * cd + cf)
                rmat = None
            elif op == "rg" and len(stack) >= 3:
                fill = _rgb255(float(stack[-3][1]), float(stack[-2][1]),
                               float(stack[-1][1]))
            elif op == "g" and stack:
                v = float(stack[-1][1])
                fill = _rgb255(v, v, v)
            elif op == "k" and len(stack) >= 4:
                c_, m_, y_, k_ = (float(stack[j][1]) for j in range(-4, 0))
                fill = _rgb255((1.0 - min(1.0, c_ + k_)),
                               (1.0 - min(1.0, m_ + k_)),
                               (1.0 - min(1.0, y_ + k_)))
            elif op == "'" and stack:
                ly -= leading
                tx, ty = lx, ly
                tx += show(str(stack[-1][1]), tx, ty)
            elif op == '"' and len(stack) >= 3:
                tw = float(stack[-3][1])
                tc = float(stack[-2][1])
                ly -= leading
                tx, ty = lx, ly
                tx += show(str(stack[-1][1]), tx, ty)
            elif op == "m" and len(stack) >= 2:
                cx, cy = float(stack[-2][1]), float(stack[-1][1])
            elif op == "l" and len(stack) >= 2:
                nx, ny = float(stack[-2][1]), float(stack[-1][1])
                seg(cx, cy, nx, ny)
                cx, cy = nx, ny
            elif op == "re" and len(stack) >= 4:
                x, y, w, h = (float(stack[j][1]) for j in (-4, -3, -2, -1))
                seg(x, y, x + w, y)
                seg(x, y + h, x + w, y + h)
                seg(x, y, x, y + h)
                seg(x + w, y, x + w, y + h)
            elif op in ("S", "s", "B", "b", "B*", "b*", "f", "F", "f*"):
                pending.extend(subpath)
                subpath = []
            elif op == "n":
                subpath = []  # no-op paint (clipping path): discard
        except (ValueError, TypeError, IndexError):
            pass  # skip malformed operator (reference E3 degradation)
        stack.clear()

    page.segments.extend(pending)
    page.segments.extend(subpath)


def parse_pdf(data: bytes, password: str | None = None) -> PdfFile:
    """Full document parse: bytes -> pages of spans + rule segments +
    truthy metadata (reference core/document.py:169-178 semantics).
    ``password`` unlocks standard-security-handler encryption (RC4/AES;
    empty-user-password documents open with no password, like PyMuPDF's
    open-time attempt — reference core/document.py:109-123).

    Error contract: malformed input raises ``PdfError``, full stop —
    callers (extract_document, engine/paged) degrade per document on
    that type. Truncated strings, bad hex, overflowing numerics and the
    like surface from the lexer/filters as builtin exceptions, so the
    implementation is wrapped: any data-shaped exception converts to
    PdfError here rather than aborting a whole Spark task batch."""
    import struct
    import zlib

    try:
        return _parse_pdf_impl(data, password)
    except PdfError:
        raise
    except RecursionError as e:
        raise PdfError(f"malformed document: {e!r}") from e
    except (ValueError, IndexError, KeyError, TypeError, AttributeError,
            OverflowError, ZeroDivisionError, EOFError,
            UnicodeDecodeError, struct.error, zlib.error) as e:
        raise PdfError(
            f"malformed document: {type(e).__name__}: {e}") from e


def _parse_pdf_impl(data: bytes, password: str | None = None) -> PdfFile:
    doc = _Doc(data, password)
    root = doc.obj(doc.trailer.get("Root"))
    pages_node = doc.obj(root.get("Pages")) if isinstance(root, dict) else None
    page_refs: list = []

    def walk(node, depth: int = 0, inherited_mb=None,
             inherited_res=None) -> None:
        """Page-tree walk with MediaBox AND Resources inheritance (PDF
        spec §7.7.3.4: Page inherits both from Pages parents — fonts
        declared once on the root Pages node are the common real-world
        layout, and missing them silently degrades every glyph width
        to the Helvetica fallback)."""
        if not isinstance(node, dict) or depth > 32:
            return
        mb = node.get("MediaBox", inherited_mb)
        res = node.get("Resources", inherited_res)
        if node.get("Type") == "Pages" or "Kids" in node:
            for kid in doc.obj(node.get("Kids")) or []:
                walk(doc.obj(kid), depth + 1, mb, res)
        elif node.get("Type") == "Page" or "Contents" in node:
            patched = {}
            if "MediaBox" not in node and mb is not None:
                patched["MediaBox"] = mb
            if "Resources" not in node and res is not None:
                patched["Resources"] = res
            if patched:
                node = {**node, **patched}
            page_refs.append(node)

    if pages_node is not None:
        walk(pages_node)
    if not page_refs:
        # fallback: scan every object for /Type /Page
        for num in sorted(doc.objs):
            o = doc.obj(Ref((num, 0)))
            if isinstance(o, dict) and o.get("Type") == "Page":
                page_refs.append(o)
    if not page_refs:
        raise PdfError("document has no pages")

    # FontDecode construction parses /ToUnicode streams and /W arrays —
    # cache per font REF so multi-page docs sharing fonts pay once.
    font_cache: dict = {}

    def build_font(fref) -> FontDecode | None:
        key = fref if isinstance(fref, Ref) else id(fref)
        if key in font_cache:
            return font_cache[key]
        fobj = doc.obj(fref)
        fd = None
        if isinstance(fobj, dict):
            base = fobj.get("BaseFont")
            if isinstance(base, str):
                diffs: dict[int, str] = {}
                enc = doc.obj(fobj.get("Encoding"))
                if isinstance(enc, dict):
                    code = 0
                    for item in doc.obj(enc.get("Differences")) or []:
                        if isinstance(item, (int, float)):
                            code = int(item)
                        elif isinstance(item, str):
                            diffs[code] = item
                            code += 1
                to_uni: dict[int, str] = {}
                tu_ref = fobj.get("ToUnicode")
                if isinstance(tu_ref, Ref):
                    try:
                        to_uni = _parse_tounicode(doc.stream(tu_ref))
                    except PdfError:
                        to_uni = {}
                two_byte = fobj.get("Subtype") == "Type0"
                cid_widths: dict[int, float] = {}
                default_w = 1000.0
                if two_byte:
                    desc = doc.obj(fobj.get("DescendantFonts"))
                    if isinstance(desc, list) and desc:
                        dfont = doc.obj(desc[0])
                        if isinstance(dfont, dict):
                            dw = doc.obj(dfont.get("DW"))
                            if isinstance(dw, (int, float)):
                                default_w = float(dw)
                            cid_widths = _parse_cid_widths(
                                doc.obj(dfont.get("W")) or [])
                fd = FontDecode(base, diffs or None, to_uni or None,
                                two_byte=two_byte, cid_widths=cid_widths,
                                default_width=default_w)
        font_cache[key] = fd
        return fd

    out_pages: list[PdfPage] = []
    for idx, pnode in enumerate(page_refs, start=1):
        mb = doc.obj(pnode.get("MediaBox")) or [0, 0, 612, 792]
        width = float(doc.obj(mb[2]) - doc.obj(mb[0]))
        height = float(doc.obj(mb[3]) - doc.obj(mb[1]))
        page = PdfPage(number=idx, width=width, height=height)

        font_map: dict[str, FontDecode] = {}
        res = doc.obj(pnode.get("Resources"))
        if isinstance(res, dict):
            fdict = doc.obj(res.get("Font"))
            if isinstance(fdict, dict):
                for fid, fref in fdict.items():
                    fd = build_font(fref)
                    if fd is not None:
                        font_map[fid] = fd

        contents = pnode.get("Contents")
        content_refs = (doc.obj(contents)
                        if isinstance(doc.obj(contents), list)
                        else [contents]) if contents is not None else []
        blob = bytearray()
        for cref in content_refs:
            if isinstance(cref, Ref):
                try:
                    blob += doc.stream(cref)
                    blob += b"\n"
                except PdfError:
                    # corrupt content stream: page falls back to empty
                    # (reference E2, document.py:276-283)
                    continue
        _interpret(bytes(blob), page, font_map)
        out_pages.append(page)

    meta: dict[str, str] = {}
    info = doc.obj(doc.trailer.get("Info"))
    if isinstance(info, dict):
        # truthy-value filter: reference core/document.py:177-178
        meta = {k: str(v) for k, v in info.items()
                if isinstance(v, (str, int, float)) and v}
    return PdfFile(pages=out_pages, metadata=meta)


def is_pdf(data: bytes) -> bool:
    """Magic-byte sniff routing PDF vs HTML (SURVEY.md §7.0)."""
    return data[:5] == b"%PDF-" or b"%PDF-" in data[:1024]
