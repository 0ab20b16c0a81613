"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

``decode_real`` parses every header-only format the standard library
can handle (BMP/PNG/GIF/PNM/JPEG dimensions — JPEG via the SOFn marker
walk, no entropy decode — and WAV duration) directly from the bytes;
only pixel/sample decode of COMPRESSED codecs (JPEG pixels, MP3,
H.264) raises NotImplementedError, because those libraries (PIL/
ffmpeg/torchaudio) are not in this container. Everything Spark-side is real
and tested: the schema, the partition-preserving mapInPandas plumbing,
the Arrow batch shape, and a deterministic fake feature extractor
(byte histogram) that stands in for a real CNN/codec so downstream
operators (similarity, dedup) can be exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", StringType()),     # opaque bytes (binary upstream)
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(FloatType())),  # 16-dim
    # first histogram bin at full float64 precision: the value-oracle
    # column (float32 features lose 6-dp round-trip stability)
    StructField("f0", DoubleType()),
])

N_FEATURES = 16


def decode_real(payload: bytes, kind: str | None = None) -> dict:
    """Header-only decode for container formats whose metadata is plain
    bytes — no codec library needed: BMP / PNG / GIF / PNM / JPEG
    dimensions (SOFn marker walk), WAV duration. Detection is by magic
    bytes, not by ``kind`` (a crawl's declared type lies often enough
    that trusting it is a bug).

    Compressed codecs (MP3, H.264, ...) still raise
    NotImplementedError: pixel/sample decode genuinely requires
    libraries absent from this container — wire PIL / soundfile / pyav
    here on a cluster that has them.

    Returns {"format", "width", "height", "duration_ms"} (None where
    the format has no such axis)."""
    p = payload or b""
    if p[:2] == b"BM" and len(p) >= 26:
        hdr = int.from_bytes(p[14:18], "little")
        if hdr == 12:  # OS/2 BITMAPCOREHEADER: uint16 dimensions
            w = int.from_bytes(p[18:20], "little")
            h = int.from_bytes(p[20:22], "little")
        elif hdr in (40, 52, 56, 108, 124):  # BITMAPINFOHEADER family
            w = int.from_bytes(p[18:22], "little", signed=True)
            # negative height = top-down row order; magnitude is size
            h = abs(int.from_bytes(p[22:26], "little", signed=True))
        else:
            raise NotImplementedError(f"unknown BMP header size {hdr}")
        return {"format": "bmp", "width": _dim(w), "height": _dim(h),
                "duration_ms": None}
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
        return {"format": "png",
                "width": _dim(int.from_bytes(p[16:20], "big")),
                "height": _dim(int.from_bytes(p[20:24], "big")),
                "duration_ms": None}
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        return {"format": "gif",
                "width": int.from_bytes(p[6:8], "little"),
                "height": int.from_bytes(p[8:10], "little"),
                "duration_ms": None}
    if len(p) >= 2 and p[0:1] == b"P" and p[1:2] in b"123456":
        w, h = _pnm_dims(p)
        return {"format": "pnm", "width": _dim(w), "height": _dim(h),
                "duration_ms": None}
    if p[:3] == b"\xff\xd8\xff":
        w, h = _jpeg_dims(p)
        return {"format": "jpeg", "width": _dim(w), "height": _dim(h),
                "duration_ms": None}
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return {"format": "wav", "width": None, "height": None,
                "duration_ms": _wav_duration_ms(p)}
    raise NotImplementedError(
        f"no stdlib-parseable header recognized "
        f"(magic={p[:4]!r}); compressed codecs need PIL/soundfile/pyav, "
        f"which are not available in this environment — use "
        f"byte_histogram_features (deterministic fake) instead")


_MAX_DIM = 1 << 30       # sane pixel-dimension bound (fits int32)
_MAX_DURATION_MS = (1 << 31) - 1


def _dim(v: int) -> int:
    """Validate a decoded pixel dimension: corrupt headers must degrade
    (NotImplementedError -> format='opaque'), never emit values that
    wrap Arrow's int32 into silent garbage."""
    if not 0 < v <= _MAX_DIM:
        raise NotImplementedError(f"implausible decoded dimension {v}")
    return v


def _pnm_dims(p: bytes) -> tuple[int, int]:
    """PNM (PBM/PGM/PPM) ASCII header: magic, then whitespace-separated
    width height, with '#' comments running to end-of-line."""
    vals: list[int] = []
    i = 2
    n = len(p)
    while i < n and len(vals) < 2:
        c = p[i]
        if c == 0x23:  # '#' comment
            while i < n and p[i] not in b"\r\n":
                i += 1
        elif c in b" \t\r\n\x0b\x0c":
            i += 1
        elif 0x30 <= c <= 0x39:
            j = i
            while j < n and 0x30 <= p[j] <= 0x39:
                j += 1
            vals.append(int(p[i:j]))
            i = j
        else:
            break
    if len(vals) < 2:
        raise NotImplementedError("truncated PNM header")
    return vals[0], vals[1]


# SOFn markers carrying frame dimensions: C0-CF minus DHT(C4),
# JPG-extension(C8) and DAC(CC). Covers baseline (SOF0), progressive
# (SOF2), and the arithmetic/lossless variants.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})  # TEM, RST0-7


def _jpeg_dims(p: bytes) -> tuple[int, int]:
    """JPEG frame dimensions from the SOFn marker segment — header-only,
    no entropy decode: walk marker segments from SOI until a SOFn, whose
    payload is [len:2][precision:1][height:2][width:2][ncomp:1]
    (ITU-T T.81 §B.2.2). A file whose scan starts before any SOFn, or
    whose height is 0 (deferred to a DNL marker we'd need the scan to
    reach), degrades via NotImplementedError -> format='opaque'."""
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            raise NotImplementedError("JPEG marker stream desynced")
        while i < n and p[i] == 0xFF:  # fill bytes before the code
            i += 1
        if i >= n:
            break
        code = p[i]
        i += 1
        if code in _JPEG_STANDALONE:
            continue  # no length field
        if code == 0xD9:  # EOI before any SOF
            break
        if i + 2 > n:
            break
        seg_len = int.from_bytes(p[i:i + 2], "big")
        if seg_len < 2:
            raise NotImplementedError("invalid JPEG segment length")
        if code in _JPEG_SOF:
            if i + 7 > n:
                break
            h = int.from_bytes(p[i + 3:i + 5], "big")
            w = int.from_bytes(p[i + 5:i + 7], "big")
            return w, h
        if code == 0xDA:  # SOS: entropy data follows, SOF should precede
            break
        i += seg_len
    raise NotImplementedError("truncated JPEG: no SOFn marker before "
                              "SOS/EOI/end of bytes")


def _wav_duration_ms(p: bytes) -> int:
    """Walk RIFF chunks: byte rate from 'fmt ', payload size from
    'data'; duration = data bytes / bytes-per-second."""
    byte_rate = None
    data_size = None
    i = 12
    n = len(p)
    while i + 8 <= n:
        cid = p[i:i + 4]
        size = int.from_bytes(p[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 20 <= n:
            byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        raise NotImplementedError("malformed WAV: missing fmt/data chunk")
    ms = round(data_size * 1000 / byte_rate)
    if not 0 <= ms <= _MAX_DURATION_MS:
        raise NotImplementedError(f"implausible decoded duration {ms}ms")
    return ms


def _byte_histogram(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: 16-bin byte histogram,
    L1-normalized. Replaces decode->resize->embed on codec-less hosts;
    the Spark plumbing (batching, schema, partitioning) is identical."""
    if not payload:
        return np.zeros(N_FEATURES, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float32)
    return hist / max(1.0, hist.sum())


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            bytes(p) if isinstance(p, (bytes, bytearray))
            else str(p).encode() for p in pdf["payload"]
        ]
        feats = [_byte_histogram(p).tolist() for p in payloads]
        f0 = [
            (float(np.count_nonzero(
                (np.frombuffer(p, dtype=np.uint8) >> 4) == 0)) / len(p))
            if p else 0.0
            for p in payloads
        ]
        yield pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "kind": pdf["kind"],
            "n_bytes": [len(p) for p in payloads],
            "features": feats,
            "f0": f0,
        })


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched; runs in
    the input's partitions (no shuffle — same rationale as extraction)."""
    return media.select("media_id", "kind", "payload") \
                .mapInPandas(_feature_batches, FEATURE_SCHEMA)


DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("format", StringType()),      # detected, or 'opaque'
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])


def decode_media(media: DataFrame) -> DataFrame:
    """Header-only metadata decode over the payload bytes (decode_real):
    width/height/duration_ms come FROM THE BYTES for
    BMP/PNG/GIF/PNM/JPEG/WAV;
    payloads needing a real codec come back format='opaque' with null
    axes (never an executor crash — E3 degradation semantics). Same
    partition-preserving mapInPandas shape as extract_features."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": pdf["media_id"].astype("int64"),
                   "kind": pdf["kind"], "format": [], "width": [],
                   "height": [], "duration_ms": []}
            for p in pdf["payload"]:
                raw = bytes(p) if isinstance(p, (bytes, bytearray)) \
                    else str(p).encode()
                try:
                    d = decode_real(raw)
                except NotImplementedError:
                    d = {"format": "opaque", "width": None,
                         "height": None, "duration_ms": None}
                out["format"].append(d["format"])
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["duration_ms"].append(d["duration_ms"])
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload") \
                .mapInPandas(batches, DECODED_SCHEMA)


def make_bmp(w: int, h: int) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bit BMP with real (zeroed) pixel
    rows — fixture-synthesis helper shared with the tests."""
    row = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    pix = bytes(row) * h
    return (b"BM" + (54 + len(pix)).to_bytes(4, "little") + bytes(4)
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + bytes(24)) + pix


def make_jpeg(w: int, h: int, progressive: bool = False) -> bytes:
    """Minimal structurally-valid JPEG header stream: SOI, JFIF APP0,
    a quantization table, SOF0 (baseline) or SOF2 (progressive) carrying
    the dimensions, then SOS + EOI. Enough real marker structure that a
    header-only dimension parse must actually walk segments (the SOF is
    NOT at a fixed offset)."""
    app0 = (b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
            + b"\x01\x01\x00" + b"\x00\x48\x00\x48" + b"\x00\x00")
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(64)
    sof_code = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = (sof_code + (11).to_bytes(2, "big") + b"\x08"
           + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + b"\x01" + b"\x01\x11\x00")
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + app0 + dqt + sof + sos + b"\xff\xd9"


def make_wav(duration_ms: int, rate: int = 8000) -> bytes:
    """PCM16 mono WAV with a real data chunk sized to duration_ms."""
    n = duration_ms * rate // 1000
    data = bytes(2 * n)
    byte_rate = rate * 2
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVEfmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (len(body) + 4).to_bytes(4, "little") + body


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-FORMAT media sidecar synthesized from doc_id
    (the value-oracle twin of decode_media): doc_id%3==0 -> an image
    whose dimensions are doc_id arithmetic (BMP when doc_id%6==0, else
    JPEG — baseline SOF0 / progressive SOF2 alternating on doc_id%12),
    ==1 -> WAV whose duration is doc_id arithmetic, ==2 -> an opaque
    mp4-magic blob. Because every decoded value is a pure function of
    doc_id, the DuckDB oracle is a CASE projection while the Spark side
    round-trips actual bytes."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "kind": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                out["media_id"].append(did)
                m = did % 3
                if m == 0:
                    out["kind"].append("image")
                    w, h = did % 100 + 1, did % 50 + 1
                    if did % 6 == 0:
                        out["payload"].append(make_bmp(w, h))
                    else:
                        out["payload"].append(
                            make_jpeg(w, h, progressive=did % 12 == 9))
                elif m == 1:
                    out["kind"].append("audio")
                    out["payload"].append(make_wav((did % 30 + 1) * 100))
                else:
                    out["kind"].append("video")
                    out["payload"].append(
                        b"\x00\x00\x00\x18ftypmp42" + bytes(16))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        batches, "media_id long, kind string, payload binary")


MEDIA_PROFILE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("f0", DoubleType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])


def media_profile(docs: DataFrame) -> DataFrame:
    """Fused contract path for the merged media_features row: BOTH
    multimodal kernels in ONE mapInPandas pass over one documents scan
    — histogram features over the utf-8 payload (the value-oracled
    twin of media_table_from_documents) and header decode over the
    synthesized real-format payload (synth_media_table's byte
    round-trip) — instead of two scans joined on media_id. Zero
    shuffles, zero joins; the library operators stay separate for
    callers that need only one side."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "kind": [], "n_bytes": [], "f0": [],
                   "format": [], "width": [], "height": [],
                   "duration_ms": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                payload = (text or "").encode("utf-8")
                m = did % 3
                out["media_id"].append(did)
                out["kind"].append(
                    "image" if m == 0 else "audio" if m == 1 else "video")
                out["n_bytes"].append(len(payload))
                out["f0"].append(
                    (float(np.count_nonzero(
                        (np.frombuffer(payload, dtype=np.uint8) >> 4)
                        == 0)) / len(payload)) if payload else 0.0)
                if m == 0:
                    w, h = did % 100 + 1, did % 50 + 1
                    synth = (make_bmp(w, h) if did % 6 == 0 else
                             make_jpeg(w, h, progressive=did % 12 == 9))
                elif m == 1:
                    synth = make_wav((did % 30 + 1) * 100)
                else:
                    synth = b"\x00\x00\x00\x18ftypmp42" + bytes(16)
                try:
                    d = decode_real(synth)
                except NotImplementedError:
                    d = {"format": "opaque", "width": None,
                         "height": None, "duration_ms": None}
                out["format"].append(d["format"])
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["duration_ms"].append(d["duration_ms"])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        batches, MEDIA_PROFILE_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Oracle-reproducible media table: the documents' utf-8 bytes act
    as opaque payloads (DuckDB recomputes them with encode(text), so the
    feature values get a full value oracle, unlike the synthesized
    pages-table payloads which only exist Spark-side)."""
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
             .when(F.col("doc_id") % 3 == 1, "audio")
             .otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
        F.lit(0).alias("duration_ms"),
    )


def media_table_from_pages(pages: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the pages table: the html
    bytes act as opaque payloads (kind assigned by doc_id arithmetic) —
    schema-faithful stand-in for a crawl's media sidecar table."""
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    kind = (F.when(doc_id % 3 == 0, "image")
             .when(doc_id % 3 == 1, "audio")
             .otherwise("video"))
    return pages.select(
        doc_id.alias("media_id"),
        kind.alias("kind"),
        F.col("html").alias("payload"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
        F.lit(0).alias("duration_ms"),
    )
