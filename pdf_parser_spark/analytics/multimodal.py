"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode step is STUBBED (clearly marked NotImplementedError behind
``decode_real``), while everything Spark-side is real and tested: the
schema, the partition-preserving mapInPandas plumbing, the Arrow batch
shape, and a deterministic fake feature extractor (byte histogram) that
stands in for a real CNN/codec so downstream operators (similarity,
dedup) can be exercised end-to-end.
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


def decode_real(payload: bytes, kind: str):
    """Real decode hook — wire PIL / soundfile / pyav here on a cluster
    with the codecs installed."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use byte_histogram_features (deterministic fake) instead")


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
