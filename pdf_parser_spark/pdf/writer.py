"""Deterministic constrained-subset PDF writer.

Used ONLY to synthesize fixtures / the pages table (TESTDATA.md has no PDF
bytes). Emits valid PDF 1.4: xref table, Info dict, FlateDecode content
streams, base-14 fonts, text ops (BT/Tf/Td/Tj/ET) and path ops (m/l/re/S)
for ruled tables — exactly the subset ``pdf.tokenizer`` parses, so the
writer/tokenizer pair is inverse by construction (SURVEY.md §7.3 item 2).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

FONT_IDS = {
    "F1": "Helvetica",
    "F2": "Helvetica-Bold",
    "F3": "Helvetica-Oblique",
    "F4": "Courier",
}


@dataclass
class Text:
    """One show-text op. (x, y) is the BASELINE position in PDF user space
    (bottom-left origin, y up)."""

    x: float
    y: float
    text: str
    font: str = "F1"   # key into FONT_IDS
    size: float = 12.0


@dataclass
class Rule:
    """One stroked line segment (table lattice rules)."""

    x0: float
    y0: float
    x1: float
    y1: float


@dataclass
class Rect:
    """One stroked rectangle (x, y = lower-left corner)."""

    x: float
    y: float
    w: float
    h: float


@dataclass
class Page:
    width: float = 612.0
    height: float = 792.0
    texts: list = field(default_factory=list)
    rules: list = field(default_factory=list)


_ESC_NEEDED = re.compile(rb"[^ -~]|[()\\]")


def _esc(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    if _ESC_NEEDED.search(b) is None:  # plain printable ASCII fast path
        return b
    out = bytearray()
    for c in b:
        if c in (0x28, 0x29, 0x5C):  # ( ) \
            out.append(0x5C)
            out.append(c)
        elif 32 <= c < 127:
            out.append(c)
        else:
            out += ("\\%03o" % c).encode()
    return bytes(out)


def _num(v: float) -> str:
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return s if s else "0"


def _content(page: Page) -> bytes:
    parts: list[bytes] = []
    for t in page.texts:
        parts.append(
            b"BT /%s %s Tf %s %s Td (%s) Tj ET"
            % (t.font.encode(), _num(t.size).encode(), _num(t.x).encode(),
               _num(t.y).encode(), _esc(t.text))
        )
    for r in page.rules:
        if isinstance(r, Rect):
            parts.append(b"%s %s %s %s re S" % tuple(
                _num(v).encode() for v in (r.x, r.y, r.w, r.h)))
        else:
            parts.append(b"%s %s m %s %s l S" % tuple(
                _num(v).encode() for v in (r.x0, r.y0, r.x1, r.y1)))
    return b"\n".join(parts)


def _tounicode_cmap(mapping: dict[int, str]) -> bytes:
    """Minimal /ToUnicode CMap stream body (bfchar entries)."""
    entries = b"\n".join(
        b"<%02X> <%s>" % (code, "".join(
            f"{ord(ch):04X}" for ch in dst).encode())
        for code, dst in sorted(mapping.items())
    )
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"%d beginbfchar\n%s\nendbfchar\nendcmap\n"
        b"CMapName currentdict /CMap defineresource pop\nend\nend"
        % (len(mapping), entries)
    )


def build_pdf(pages: list[Page], info: dict[str, str] | None = None,
              compress: bool = True,
              tounicode: dict[str, dict[int, str]] | None = None,
              differences: dict[str, dict[int, str]] | None = None,
              encrypt: dict | None = None) -> bytes:
    """Assemble a complete PDF byte stream with a correct xref table.

    ``tounicode``  : font-id -> {byte code -> unicode str} (/ToUnicode CMap)
    ``differences``: font-id -> {byte code -> glyph name} (/Encoding)
    ``encrypt``    : standard security handler, e.g. {"method":
                     "rc4-128"|"rc4-40"|"aes-128"|"aes-256", "user_pw":
                     "", "owner_pw": "owner"} — deterministic (fixed /ID
                     and AES IVs derived from object numbers)"""
    tounicode = tounicode or {}
    differences = differences or {}
    objs: list[bytes] = []  # 1-indexed object bodies (dict part only)

    n_pages = len(pages)
    font_obj_base = 3 + 2 * n_pages  # catalog, pages, then page+content pairs
    font_res = b" ".join(
        b"/%s %d 0 R" % (fid.encode(), font_obj_base + i)
        for i, fid in enumerate(FONT_IDS)
    )

    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))

    streams: dict[int, bytes] = {}
    for i, pg in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %s %s] "
            b"/Resources << /Font << %s >> >> /Contents %d 0 R >>"
            % (_num(pg.width).encode(), _num(pg.height).encode(),
               font_res, content_num)
        )
        raw = _content(pg)
        data = zlib.compress(raw) if compress else raw
        filt = b" /Filter /FlateDecode" if compress else b""
        objs.append(b"<< /Length %d%s >>" % (len(data), filt))
        streams[content_num] = data

    tu_obj_nums: dict[str, int] = {}
    n_fonts = len(FONT_IDS)
    next_obj = font_obj_base + n_fonts
    for fid in tounicode:
        tu_obj_nums[fid] = next_obj
        next_obj += 1

    for fid, base in FONT_IDS.items():
        body = (b"<< /Type /Font /Subtype /Type1 /BaseFont /%s /Name /%s"
                % (base.encode(), fid.encode()))
        if fid in differences:
            diff_items = []
            for code in sorted(differences[fid]):
                diff_items.append(b"%d /%s"
                                  % (code, differences[fid][code].encode()))
            body += (b" /Encoding << /Type /Encoding /Differences [%s] >>"
                     % b" ".join(diff_items))
        if fid in tu_obj_nums:
            body += b" /ToUnicode %d 0 R" % tu_obj_nums[fid]
        objs.append(body + b" >>")

    for fid, mapping in tounicode.items():
        data = _tounicode_cmap(mapping)
        objs.append(b"<< /Length %d >>" % len(data))
        streams[len(objs)] = data

    info_num = None
    if info:
        kv = b" ".join(
            b"/%s (%s)" % (k.encode(), _esc(v)) for k, v in info.items()
        )
        objs.append(b"<< %s >>" % kv)
        info_num = len(objs)

    enc_num = None
    id0 = b""
    if encrypt is not None:
        import hashlib
        import re as _re

        from . import crypto

        method = encrypt.get("method", "rc4-128")
        user_pw = encrypt.get("user_pw", "").encode("latin-1")
        owner_pw = encrypt.get("owner_pw", "owner").encode("latin-1")
        v, r, length = {"rc4-40": (1, 2, 40), "rc4-128": (2, 3, 128),
                        "aes-128": (4, 4, 128),
                        "aes-256": (5, 6, 256)}[method]
        aes = method == "aes-128"
        id0 = hashlib.md5(b"".join(objs)).digest()  # deterministic /ID
        p = -44
        if v == 5:
            # §7.6.4.3.2: conformant writers hash at most 127 UTF-8
            # bytes of the password (reader truncates identically)
            user_pw, owner_pw = user_pw[:127], owner_pw[:127]
            # ISO 32000-2 §7.6.4.4: deterministic 32-byte file key and
            # salts (fixture reproducibility); U/UE from the user pw,
            # O/OE from the owner pw over U[0:48].
            key = hashlib.sha256(b"filekey" + id0).digest()
            # salts are corpus-CONSTANT (not id0-derived): every doc
            # sharing (password, salt) hits the memoized Algorithm-2.B
            # value, so a worker pays the ~0.3s derivation once per
            # corpus, not once per document. File keys stay per-doc.
            vs_u = hashlib.sha256(b"vsu").digest()[:8]
            ks_u = hashlib.sha256(b"ksu").digest()[:8]
            vs_o = hashlib.sha256(b"vso").digest()[:8]
            ks_o = hashlib.sha256(b"kso").digest()[:8]
            u_entry = crypto.hash_2b(user_pw, vs_u) + vs_u + ks_u
            ue = crypto.aes_cbc_encrypt_nopad(
                crypto.hash_2b(user_pw, ks_u), key, bytes(16))
            o_entry = (crypto.hash_2b(owner_pw, vs_o, u_entry[:48])
                       + vs_o + ks_o)
            oe = crypto.aes_cbc_encrypt_nopad(
                crypto.hash_2b(owner_pw, ks_o, u_entry[:48]), key,
                bytes(16))
            import struct as _struct
            perms_clear = (_struct.pack("<i", p) + b"\xff\xff\xff\xff"
                           + b"Tadb" + id0[:4])
            perms = crypto.aes_ecb_encrypt(key, perms_clear)
        else:
            kb = 5 if r == 2 else length // 8
            o_entry = crypto.compute_o(owner_pw, user_pw, r, kb)
            key = crypto.compute_key(user_pw, o_entry, p, id0, r, kb)
            u_entry = crypto.compute_u(key, id0, r)

        def enc_bytes(data: bytes, num: int) -> bytes:
            if v == 5:  # AESV3: file key used directly
                iv = hashlib.md5(b"iv%d" % num).digest()
                return crypto.aes_cbc_encrypt(key, data, iv)
            ok = crypto.object_key(key, num, 0, aes)
            if aes:
                iv = hashlib.md5(b"iv%d" % num).digest()
                return crypto.aes_cbc_encrypt(ok, data, iv)
            return crypto.rc4(ok, data)

        for num in list(streams):
            data = enc_bytes(streams[num], num)
            streams[num] = data
            objs[num - 1] = _re.sub(rb"/Length \d+",
                                    b"/Length %d" % len(data),
                                    objs[num - 1], count=1)
        if info_num:
            kv = b" ".join(
                b"/%s (%s)" % (
                    k.encode(),
                    _esc(enc_bytes(val.encode("latin-1"),
                                   info_num).decode("latin-1")))
                for k, val in info.items())
            objs[info_num - 1] = b"<< %s >>" % kv
        if v == 5:
            objs.append(
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
                b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                b"/StmF /StdCF /StrF /StdCF >>"
                % (p, o_entry.hex().encode(), u_entry.hex().encode(),
                   oe.hex().encode(), ue.hex().encode(),
                   perms.hex().encode()))
        else:
            cf = (b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                  b" /StmF /StdCF /StrF /StdCF" if aes else b"")
            objs.append(
                b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
                b"/O <%s> /U <%s>%s >>"
                % (v, r, length, p, o_entry.hex().encode(),
                   u_entry.hex().encode(), cf))
        enc_num = len(objs)

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for num, body in enumerate(objs, start=1):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n%s\n" % (num, body)
        if num in streams:
            buf += b"stream\n" + streams[num] + b"\nendstream\n"
        buf += b"endobj\n"

    xref_off = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for num in range(1, len(objs) + 1):
        buf += b"%010d 00000 n \n" % offsets[num]
    trailer = b"<< /Size %d /Root 1 0 R" % (len(objs) + 1)
    if info_num:
        trailer += b" /Info %d 0 R" % info_num
    if enc_num:
        trailer += (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                    % (enc_num, id0.hex().encode(), id0.hex().encode()))
    trailer += b" >>"
    buf += b"trailer\n%s\nstartxref\n%d\n%%%%EOF\n" % (trailer, xref_off)
    return bytes(buf)
