"""PDF standard security handler (public spec, ISO 32000-1 §7.6):
RC4-40/128 (V1/V2, R2/R3) and AES-128-CBC (V4 /AESV2, R4), pure Python
(hashlib MD5 + generated AES tables — no external crypto deps, matching
the sandbox constraint).

Reference behavior parity (reference core/document.py:109-123): decrypt
on load; "no password" and "invalid password" are distinct load errors.
The writer-side encryptor lives here too so fixtures can round-trip.
"""

from __future__ import annotations

import hashlib
import struct

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    # pre-tile the key to 256 bytes: drops the modulo+index from the
    # KSA inner loop (the KSA dominates short-buffer calls like the
    # 19-iteration /O //U derivation loops)
    k = (key * (256 // len(key) + 1))[:256]
    for i in range(256):
        j = (j + s[i] + k[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        sj = s[j := (j + s[i]) & 0xFF]
        s[j] = s[i]
        s[i] = sj
        out[n] = c ^ s[(sj + s[j]) & 0xFF]
    return bytes(out)


# -- AES-128 (tables generated from GF(2^8), verified vs FIPS-197) ----------

def _build_tables():
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 0x03 = x * 2 ^ x
        x2 = (x << 1) ^ (0x11B if x & 0x80 else 0)
        x = x2 ^ x
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def mul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox = [0] * 256
    inv_sbox = [0] * 256
    for a in range(256):
        inv = exp[255 - log[a]] if a else 0
        b = inv
        r = 0x63
        for k in range(5):
            r ^= ((b << k) | (b >> (8 - k))) & 0xFF
        sbox[a] = r
        inv_sbox[r] = a
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _GMUL = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule: 11 round keys of 16 bytes."""
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(11)]


def _add_rk(state, rk):
    return [s ^ k for s, k in zip(state, rk)]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks) -> bytes:
    s = _add_rk(list(block), rks[0])
    for rnd in range(1, 10):
        s = [_SBOX[b] for b in s]
        s = [s[i] for i in _SHIFT]
        out = [0] * 16
        for c in range(4):
            a = s[4 * c:4 * c + 4]
            out[4 * c + 0] = _GMUL(a[0], 2) ^ _GMUL(a[1], 3) ^ a[2] ^ a[3]
            out[4 * c + 1] = a[0] ^ _GMUL(a[1], 2) ^ _GMUL(a[2], 3) ^ a[3]
            out[4 * c + 2] = a[0] ^ a[1] ^ _GMUL(a[2], 2) ^ _GMUL(a[3], 3)
            out[4 * c + 3] = _GMUL(a[0], 3) ^ a[1] ^ a[2] ^ _GMUL(a[3], 2)
        s = _add_rk(out, rks[rnd])
    s = [_SBOX[b] for b in s]
    s = [s[i] for i in _SHIFT]
    return bytes(_add_rk(s, rks[10]))


def _decrypt_block(block: bytes, rks) -> bytes:
    s = _add_rk(list(block), rks[10])
    for rnd in range(9, 0, -1):
        s = [s[i] for i in _INV_SHIFT]
        s = [_INV_SBOX[b] for b in s]
        s = _add_rk(s, rks[rnd])
        out = [0] * 16
        for c in range(4):
            a = s[4 * c:4 * c + 4]
            out[4 * c + 0] = (_GMUL(a[0], 14) ^ _GMUL(a[1], 11)
                              ^ _GMUL(a[2], 13) ^ _GMUL(a[3], 9))
            out[4 * c + 1] = (_GMUL(a[0], 9) ^ _GMUL(a[1], 14)
                              ^ _GMUL(a[2], 11) ^ _GMUL(a[3], 13))
            out[4 * c + 2] = (_GMUL(a[0], 13) ^ _GMUL(a[1], 9)
                              ^ _GMUL(a[2], 14) ^ _GMUL(a[3], 11))
            out[4 * c + 3] = (_GMUL(a[0], 11) ^ _GMUL(a[1], 13)
                              ^ _GMUL(a[2], 9) ^ _GMUL(a[3], 14))
        s = out
    s = [s[i] for i in _INV_SHIFT]
    s = [_INV_SBOX[b] for b in s]
    return bytes(_add_rk(s, rks[1 - 1]))


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 layout: 16-byte IV prefix, PKCS#7 padding."""
    if len(data) < 32 or len(data) % 16:
        return b""  # malformed: degrade, never crash (E3 semantics)
    rks = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        blk = data[i:i + 16]
        dec = _decrypt_block(blk, rks)
        out.extend(bytes(a ^ b for a, b in zip(dec, prev)))
        prev = blk
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Fixture-side encryptor (deterministic IV supplied by caller)."""
    rks = _expand_key(key)
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out.extend(prev)
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def compute_key(user_pw: bytes, o_entry: bytes, p: int, id0: bytes,
                r: int, key_bytes: int,
                encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_bytes]).digest()
    return key[:key_bytes]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int,
              key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry (fixture-side)."""
    key = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    o = rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U entry."""
    if r == 2:
        return rc4(key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def object_key(file_key: bytes, num: int, gen: int,
               aes: bool) -> bytes:
    """Algorithm 1: per-object key."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[:min(len(file_key) + 5, 16)]


class StandardSecurityHandler:
    """Authenticates a user password and decrypts strings/streams.

    Supports V1/V2 (RC4, R2/R3) and V4 with /StmF /StrF -> /CF entries
    of /AESV2 (AES-128-CBC) or /V2 (RC4). Raises ValueError for other
    handlers/revisions — callers map this to the document error ladder.
    """

    def __init__(self, enc: dict, id0: bytes):
        if enc.get("Filter") != "Standard":
            raise ValueError(
                f"unsupported security handler {enc.get('Filter')!r}")
        self.v = int(enc.get("V", 0))
        self.r = int(enc.get("R", 2))
        if self.v not in (1, 2, 4) or self.r not in (2, 3, 4):
            raise ValueError(f"unsupported encryption V={self.v} R={self.r}")
        self.length = int(enc.get("Length", 40))
        self.key_bytes = 5 if self.r == 2 else self.length // 8
        self.o = enc.get("O", "").encode("latin-1")
        self.u = enc.get("U", "").encode("latin-1")
        self.p = int(enc.get("P", -1))
        self.id0 = id0
        self.encrypt_metadata = bool(enc.get("EncryptMetadata", True))
        self.aes = False
        if self.v == 4:
            cf = enc.get("CF") or {}
            stmf = enc.get("StmF", "Identity")
            cfm = (cf.get(stmf) or {}).get("CFM", "Identity")
            if cfm == "AESV2":
                self.aes = True
                self.key_bytes = 16
            elif cfm != "V2":
                raise ValueError(f"unsupported crypt filter {cfm!r}")
        self.key: bytes | None = None

    def authenticate(self, user_pw: bytes) -> bool:
        key = compute_key(user_pw, self.o, self.p, self.id0, self.r,
                          self.key_bytes, self.encrypt_metadata)
        u = compute_u(key, self.id0, self.r)
        ok = (u[:16] == self.u[:16]) if self.r >= 3 else (u == self.u[:32])
        if ok:
            self.key = key
        return ok

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.key is None:
            raise ValueError("not authenticated")
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes_cbc_decrypt(k, data)
        return rc4(k, data)

    # fixture-side: encryption is the same op for RC4, IV-prefixed for AES
    def encrypt(self, data: bytes, num: int, gen: int,
                iv: bytes | None = None) -> bytes:
        if self.key is None:
            raise ValueError("not authenticated")
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes_cbc_encrypt(k, data, iv or bytes(16))
        return rc4(k, data)
