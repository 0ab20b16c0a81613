"""PDF standard security handler (public spec, ISO 32000-1 §7.6 and
ISO 32000-2 §7.6.4): RC4-40/128 (V1/V2, R2/R3), AES-128-CBC (V4 /AESV2,
R4) and AES-256-CBC (V5 /AESV3, R5/R6), pure Python (hashlib + generated
AES tables — no external crypto deps, matching the sandbox constraint).

Reference behavior parity (reference core/document.py:109-123): decrypt
on load; "no password" and "invalid password" are distinct load errors;
both the user and the owner password open the document (PyMuPDF
doc.authenticate() accepts either — Algorithm 7 recovers the user
password from /O for V<5, the O/OE pair authenticates directly for V5).
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


# -- AES-128/256 (tables generated from GF(2^8), verified vs FIPS-197) ------

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

# byte multiplication tables: replace per-byte _GMUL() function calls in
# MixColumns with list indexing (~4x on the Algorithm 2.B hot loop)
_M2 = [_GMUL(a, 2) for a in range(256)]
_M3 = [_GMUL(a, 3) for a in range(256)]
_M9 = [_GMUL(a, 9) for a in range(256)]
_M11 = [_GMUL(a, 11) for a in range(256)]
_M13 = [_GMUL(a, 13) for a in range(256)]
_M14 = [_GMUL(a, 14) for a in range(256)]


def _expand_key(key: bytes) -> list[list[int]]:
    """AES key schedule: Nr+1 round keys of 16 bytes (AES-128: 11,
    AES-192: 13, AES-256: 15 — FIPS-197 §5.2)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"bad AES key length {len(key)}")
    nr = nk + 6
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]  # AES-256 extra SubWord
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(nr + 1)]


_RKS_CACHE: dict[bytes, list[list[int]]] = {}


def _rks(key: bytes) -> list[list[int]]:
    rk = _RKS_CACHE.get(key)
    if rk is None:
        if len(_RKS_CACHE) > 4096:  # bound worker-lifetime growth
            _RKS_CACHE.clear()
        rk = _RKS_CACHE[key] = _expand_key(key)
    return rk


# -- word-oriented encrypt path (32-bit T-tables, FSE/OpenSSL-style) --------
# Encryption is the hot direction: Algorithm 2.B's iterated loop and all
# fixture-side CBC runs ~10^4 blocks per derivation; the T-table round is
# 16 list lookups + shifts on ints with no per-round list allocation
# (~3-4x the byte-table path). Decryption keeps the byte tables — it never
# appears inside 2.B.

def _build_te():
    te0 = [0] * 256
    for x in range(256):
        s = _SBOX[x]
        te0[x] = (_M2[s] << 24) | (s << 16) | (s << 8) | _M3[s]
    ror = lambda w: ((w >> 8) | (w << 24)) & 0xFFFFFFFF  # noqa: E731
    te1 = [ror(w) for w in te0]
    te2 = [ror(w) for w in te1]
    te3 = [ror(w) for w in te2]
    return te0, te1, te2, te3


_TE0, _TE1, _TE2, _TE3 = _build_te()
_RKW_CACHE: dict[bytes, list[int]] = {}


def _words(rk: list[int]) -> list[int]:
    return [(rk[i] << 24) | (rk[i + 1] << 16) | (rk[i + 2] << 8)
            | rk[i + 3] for i in range(0, 16, 4)]


def _rkw(key: bytes) -> list[list[int]]:
    w = _RKW_CACHE.get(key)
    if w is None:
        if len(_RKW_CACHE) > 4096:
            _RKW_CACHE.clear()
        w = _RKW_CACHE[key] = [_words(rk) for rk in _rks(key)]
    return w


def _encrypt_words(s0: int, s1: int, s2: int, s3: int,
                   rkw: list[list[int]]) -> tuple[int, int, int, int]:
    te0, te1, te2, te3, sb = _TE0, _TE1, _TE2, _TE3, _SBOX
    k = rkw[0]
    s0 ^= k[0]; s1 ^= k[1]; s2 ^= k[2]; s3 ^= k[3]  # noqa: E702
    for k in rkw[1:-1]:
        t0 = (te0[s0 >> 24] ^ te1[(s1 >> 16) & 255]
              ^ te2[(s2 >> 8) & 255] ^ te3[s3 & 255] ^ k[0])
        t1 = (te0[s1 >> 24] ^ te1[(s2 >> 16) & 255]
              ^ te2[(s3 >> 8) & 255] ^ te3[s0 & 255] ^ k[1])
        t2 = (te0[s2 >> 24] ^ te1[(s3 >> 16) & 255]
              ^ te2[(s0 >> 8) & 255] ^ te3[s1 & 255] ^ k[2])
        t3 = (te0[s3 >> 24] ^ te1[(s0 >> 16) & 255]
              ^ te2[(s1 >> 8) & 255] ^ te3[s2 & 255] ^ k[3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = rkw[-1]
    t0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16)
          | (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ k[0]
    t1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16)
          | (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ k[1]
    t2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16)
          | (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ k[2]
    t3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16)
          | (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ k[3]
    return t0, t1, t2, t3


_W4 = struct.Struct(">4I")


def _add_rk(state, rk):
    return [s ^ k for s, k in zip(state, rk)]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks) -> bytes:
    """Single-block encrypt over byte-list round keys (test/KAT API);
    bulk paths below go straight to the word kernel."""
    rkw = [_words(rk) for rk in rks]
    return _W4.pack(*_encrypt_words(*_W4.unpack(block), rkw))


def _decrypt_block(block: bytes, rks) -> bytes:
    nr = len(rks) - 1
    s = _add_rk(list(block), rks[nr])
    m9, m11, m13, m14, isb = _M9, _M11, _M13, _M14, _INV_SBOX
    for rnd in range(nr - 1, 0, -1):
        s = [s[i] for i in _INV_SHIFT]
        s = [isb[b] for b in s]
        s = _add_rk(s, rks[rnd])
        out = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            out[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            out[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            out[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            out[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = out
    s = [s[i] for i in _INV_SHIFT]
    s = [isb[b] for b in s]
    return bytes(_add_rk(s, rks[0]))


# -- OpenSSL EVP acceleration (r6) ------------------------------------------
# The system libcrypto (loaded via ctypes — public OpenSSL EVP API, no
# new Python deps) runs AES ~1000x the pure-Python kernel. Algorithm
# 2.B pushes ~10^4 CBC blocks per key derivation, which made the R6
# derivation ~1.5 s of COLD-START per Python worker (memoized after).
# Every AES entry point below tries EVP first and falls back to the
# pure-Python tables (kept intact — sandboxes without libcrypto, and
# the A/B parity test tests/test_pdf_advanced.py::test_evp_matches_
# pure_python locks the two paths together).

_EVP = None
try:  # pragma: no cover - environment-dependent
    import ctypes
    import ctypes.util as _cutil

    _lcname = _cutil.find_library("crypto")
    if _lcname:
        _lc = ctypes.CDLL(_lcname)
        _lc.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        _lc.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        for _n in ("EVP_aes_128_cbc", "EVP_aes_192_cbc",
                   "EVP_aes_256_cbc", "EVP_aes_128_ecb",
                   "EVP_aes_192_ecb", "EVP_aes_256_ecb"):
            getattr(_lc, _n).restype = ctypes.c_void_p
        _lc.EVP_CipherInit_ex.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        _lc.EVP_CIPHER_CTX_set_padding.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_int]
        _lc.EVP_CipherUpdate.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
        _EVP = _lc
except Exception:
    _EVP = None


def _evp_crypt(key: bytes, data: bytes, iv: bytes | None,
               encrypt: bool, cbc: bool) -> bytes | None:
    """One-shot EVP AES with padding off; None -> caller falls back."""
    lib = _EVP
    if lib is None or len(data) % 16:
        return None
    try:
        cipher = {(16, True): lib.EVP_aes_128_cbc,
                  (24, True): lib.EVP_aes_192_cbc,
                  (32, True): lib.EVP_aes_256_cbc,
                  (16, False): lib.EVP_aes_128_ecb,
                  (24, False): lib.EVP_aes_192_ecb,
                  (32, False): lib.EVP_aes_256_ecb}[(len(key), cbc)]()
    except KeyError:
        return None
    import ctypes
    ctx = lib.EVP_CIPHER_CTX_new()
    if not ctx:
        return None
    try:
        if lib.EVP_CipherInit_ex(ctx, cipher, None, key,
                                 iv if cbc else None,
                                 1 if encrypt else 0) != 1:
            return None
        lib.EVP_CIPHER_CTX_set_padding(ctx, 0)
        out = ctypes.create_string_buffer(len(data) + 16)
        outl = ctypes.c_int(0)
        if lib.EVP_CipherUpdate(ctx, out, ctypes.byref(outl), data,
                                len(data)) != 1:
            return None
        return out.raw[:outl.value]
    finally:
        lib.EVP_CIPHER_CTX_free(ctx)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2/AESV3 layout: 16-byte IV prefix, PKCS#7 padding."""
    if len(data) < 32 or len(data) % 16:
        return b""  # malformed: degrade, never crash (E3 semantics)
    out = aes_cbc_decrypt_nopad(key, data[16:], data[:16])
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Fixture-side encryptor (deterministic IV supplied by caller)."""
    pad = 16 - (len(data) % 16)
    return iv + aes_cbc_encrypt_nopad(key, data + bytes([pad]) * pad, iv)


def aes_cbc_encrypt_nopad(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Raw CBC over a 16-aligned buffer — Algorithm 2.B / UE / OE use
    this (no IV prefix in the output, no padding)."""
    got = _evp_crypt(key, data, iv, encrypt=True, cbc=True)
    if got is not None:
        return got
    rkw = _rkw(key)
    out = bytearray(len(data))
    p0, p1, p2, p3 = _W4.unpack(iv)
    unpack, pack = _W4.unpack_from, _W4.pack_into
    for i in range(0, len(data), 16):
        b0, b1, b2, b3 = unpack(data, i)
        p0, p1, p2, p3 = _encrypt_words(b0 ^ p0, b1 ^ p1, b2 ^ p2,
                                        b3 ^ p3, rkw)
        pack(out, i, p0, p1, p2, p3)
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, data: bytes, iv: bytes) -> bytes:
    got = _evp_crypt(key, data, iv, encrypt=False, cbc=True)
    if got is not None:
        return got
    rks = _rks(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out.extend(bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks),
                                               prev)))
        prev = blk
    return bytes(out)


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    got = _evp_crypt(key, data, None, encrypt=True, cbc=False)
    if got is not None:
        return got
    rkw = _rkw(key)
    out = bytearray(len(data))
    for i in range(0, len(data), 16):
        _W4.pack_into(out, i,
                      *_encrypt_words(*_W4.unpack_from(data, i), rkw))
    return bytes(out)


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    got = _evp_crypt(key, data, None, encrypt=False, cbc=False)
    if got is not None:
        return got
    rks = _rks(key)
    return b"".join(_decrypt_block(data[i:i + 16], rks)
                    for i in range(0, len(data), 16))


# -- AES-256 revision 6 key derivation (ISO 32000-2 §7.6.4.3.4) -------------

_2B_CACHE: dict[tuple[bytes, bytes, bytes], bytes] = {}


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B: the R6 iterated SHA-2 hash. Memoized — the loop
    costs ~10k pure-Python AES blocks, but every document of a corpus
    sharing (password, salt, udata) derives the identical value, so a
    long-lived Spark worker pays it once."""
    ck = (password, salt, udata)
    got = _2B_CACHE.get(ck)
    if got is not None:
        return got
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\x00"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k1, k[16:32])
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[mod](e).digest()
        i += 1
    out = k[:32]
    if len(_2B_CACHE) > 256:
        _2B_CACHE.clear()
    _2B_CACHE[ck] = out
    return out


def hash_v5(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """R5 (Adobe ext. 3): single SHA-256; R6: Algorithm 2.B."""
    if r == 5:
        return hashlib.sha256(password + salt + udata).digest()
    return hash_2b(password, salt, udata)


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


_O_CACHE: dict[tuple, bytes] = {}


def compute_o(owner_pw: bytes, user_pw: bytes, r: int,
              key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry (fixture-side). Memoized (r6): the
    inputs are corpus-constant passwords, but the 19-round RC4 loop ran
    per document on the writer side."""
    ck = (owner_pw, user_pw, r, key_bytes)
    got = _O_CACHE.get(ck)
    if got is not None:
        return got
    key = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    o = rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    if len(_O_CACHE) > 256:
        _O_CACHE.clear()
    _O_CACHE[ck] = o
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


_RECOVER_CACHE: dict[tuple, bytes] = {}


def recover_user_pw(owner_pw: bytes, o_entry: bytes, r: int,
                    key_bytes: int) -> bytes:
    """Algorithm 7 (decryption half): RC4-decrypt /O with the
    owner-password-derived key to recover the padded user password.
    Memoized (r6): /O is derived from corpus-constant passwords, so the
    19-round undo loop repeats identically across documents."""
    ck = (owner_pw, o_entry, r, key_bytes)
    got = _RECOVER_CACHE.get(ck)
    if got is not None:
        return got
    key = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    data = o_entry[:32]
    if r == 2:
        out = rc4(key, data)
    else:
        for i in range(19, -1, -1):  # undo the 19-round XOR-key loop
            data = rc4(bytes(b ^ i for b in key), data)
        out = data
    if len(_RECOVER_CACHE) > 256:
        _RECOVER_CACHE.clear()
    _RECOVER_CACHE[ck] = out
    return out


def _cfm_cipher(enc: dict, which: str) -> str:
    """Resolve a /StmF or /StrF entry to its CFM name ('Identity',
    'V2', 'AESV2', 'AESV3')."""
    name = enc.get(which, "Identity")
    if name == "Identity":
        return "Identity"
    cf = enc.get("CF") or {}
    return (cf.get(name) or {}).get("CFM", "Identity")


class StandardSecurityHandler:
    """Authenticates a user OR owner password and decrypts
    strings/streams.

    Supports V1/V2 (RC4, R2/R3), V4 with /StmF /StrF -> /CF entries of
    /AESV2 (AES-128-CBC), /V2 (RC4) or /Identity, and V5 R5/R6 /AESV3
    (AES-256-CBC, SHA-2 key derivation per ISO 32000-2 §7.6.4). Raises
    ValueError for other handlers/revisions — callers map this to the
    document error ladder. Streams and strings may use different crypt
    filters (/StmF vs /StrF) and each is decrypted with its own cipher.
    """

    def __init__(self, enc: dict, id0: bytes):
        if enc.get("Filter") != "Standard":
            raise ValueError(
                f"unsupported security handler {enc.get('Filter')!r}")
        self.v = int(enc.get("V", 0))
        self.r = int(enc.get("R", 2))
        if (self.v, self.r) not in {(1, 2), (1, 3), (2, 2), (2, 3),
                                    (4, 4), (5, 5), (5, 6)}:
            raise ValueError(f"unsupported encryption V={self.v} R={self.r}")
        self.length = int(enc.get("Length", 40))
        self.key_bytes = 5 if self.r == 2 else self.length // 8
        self.o = enc.get("O", "").encode("latin-1")
        self.u = enc.get("U", "").encode("latin-1")
        self.oe = enc.get("OE", "").encode("latin-1")
        self.ue = enc.get("UE", "").encode("latin-1")
        self.p = int(enc.get("P", -1))
        self.id0 = id0
        self.encrypt_metadata = bool(enc.get("EncryptMetadata", True))
        # per-kind cipher: 'rc4' | 'aes' | 'aes256' | 'identity'
        if self.v == 5:
            self.stm_cipher = self.str_cipher = "aes256"
            self.key_bytes = 32
        elif self.v == 4:
            ciphers = {}
            for which in ("StmF", "StrF"):
                cfm = _cfm_cipher(enc, which)
                if cfm == "AESV2":
                    ciphers[which] = "aes"
                elif cfm == "V2":
                    ciphers[which] = "rc4"
                elif cfm == "Identity":
                    ciphers[which] = "identity"
                else:
                    raise ValueError(f"unsupported crypt filter {cfm!r}")
            self.stm_cipher = ciphers["StmF"]
            self.str_cipher = ciphers["StrF"]
            if "aes" in (self.stm_cipher, self.str_cipher):
                self.key_bytes = 16
        else:
            self.stm_cipher = self.str_cipher = "rc4"
        self.key: bytes | None = None

    # -- authentication ------------------------------------------------

    def _try_user_legacy(self, user_pw: bytes) -> bool:
        key = compute_key(user_pw, self.o, self.p, self.id0, self.r,
                          self.key_bytes, self.encrypt_metadata)
        u = compute_u(key, self.id0, self.r)
        ok = (u[:16] == self.u[:16]) if self.r >= 3 else (u == self.u[:32])
        if ok:
            self.key = key
        return ok

    def _authenticate_v5(self, pw: bytes) -> bool:
        """Algorithm 2.A checks: user then owner (ISO 32000-2)."""
        # §7.6.4.3.2: the UTF-8 password is truncated to 127 bytes
        # BEFORE hashing — conformant writers hash the truncated form,
        # so a longer password must authenticate via its prefix
        pw = pw[:127]
        u, o = self.u, self.o
        if len(u) < 48:
            return False
        if hash_v5(pw, u[32:40], b"", self.r) == u[:32]:
            ik = hash_v5(pw, u[40:48], b"", self.r)
            self.key = aes_cbc_decrypt_nopad(ik, self.ue[:32], bytes(16))
            return True
        if len(o) >= 48 and hash_v5(pw, o[32:40], u[:48], self.r) == o[:32]:
            ik = hash_v5(pw, o[40:48], u[:48], self.r)
            self.key = aes_cbc_decrypt_nopad(ik, self.oe[:32], bytes(16))
            return True
        return False

    def authenticate(self, pw: bytes) -> bool:
        """Accept either the user or the owner password (reference
        parity: PyMuPDF doc.authenticate() tries both)."""
        if self.v == 5:
            return self._authenticate_v5(pw)
        if self._try_user_legacy(pw):
            return True
        # Algorithm 7: recover the user password from /O and retry.
        # _pad_pw truncates at 32 bytes, so feeding the recovered
        # PADDED password back through the user path is exact.
        recovered = recover_user_pw(pw, self.o, self.r, self.key_bytes)
        return self._try_user_legacy(recovered)

    # -- en/decryption ---------------------------------------------------

    def _apply(self, data: bytes, num: int, gen: int, cipher: str,
               decrypt: bool, iv: bytes | None = None) -> bytes:
        if self.key is None:
            raise ValueError("not authenticated")
        if cipher == "identity":
            return data
        if cipher == "aes256":  # V5: file key used directly, no Alg 1
            if decrypt:
                return aes_cbc_decrypt(self.key, data)
            return aes_cbc_encrypt(self.key, data, iv or bytes(16))
        k = object_key(self.key, num, gen, cipher == "aes")
        if cipher == "aes":
            if decrypt:
                return aes_cbc_decrypt(k, data)
            return aes_cbc_encrypt(k, data, iv or bytes(16))
        out = rc4(k, data)
        return out

    def decrypt(self, data: bytes, num: int, gen: int,
                string: bool = False) -> bytes:
        cipher = self.str_cipher if string else self.stm_cipher
        return self._apply(data, num, gen, cipher, decrypt=True)

    # fixture-side: encryption is the same op for RC4, IV-prefixed for AES
    def encrypt(self, data: bytes, num: int, gen: int,
                iv: bytes | None = None, string: bool = False) -> bytes:
        cipher = self.str_cipher if string else self.stm_cipher
        return self._apply(data, num, gen, cipher, decrypt=False, iv=iv)
