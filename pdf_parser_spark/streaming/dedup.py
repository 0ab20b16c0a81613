"""Streaming exact dedup: keep the FIRST document per content hash
across micro-batches via ``applyInPandasWithState`` (no built-in Spark
operator expresses cross-batch first-wins dedup with bounded state —
dropDuplicates on a stream keeps unbounded state with no count/lineage).

State per content hash: (canonical_doc_id, n_copies_seen). The first
arrival in stream order (ties within a batch: lowest doc_id, matching
the batch operator's min(doc_id) canonicalization) is emitted as the
canonical row; later copies only bump the state counter, emitting a
zero-row delta — downstream consumers see exactly one row per distinct
content.

Scale note: state size is one (hash, long, long) entry per DISTINCT
document — the same cardinality a batch groupBy would shuffle; Spark
partitions state by the group key, so it shards with the cluster. For
10^12-doc streams, bound the retention with a watermark on arrival time
or periodic state TTL (not needed for the bounded test corpus)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEDUP_SCHEMA = StructType([
    StructField("text_hash", StringType()),
    StructField("canonical_doc_id", LongType()),
])

_STATE_SCHEMA = "canonical LONG, n_copies LONG"


def _first_wins(key, batches: Iterable[pd.DataFrame], state: GroupState):
    (text_hash,) = key
    ids: list[int] = []
    for pdf in batches:
        ids.extend(int(d) for d in pdf["doc_id"])
    if not ids:
        return
    lo = min(ids)
    if state.exists:
        canonical, n = state.get
        state.update((canonical, n + len(ids)))
        return  # duplicate content: no new canonical row
    state.update((lo, len(ids)))
    yield pd.DataFrame([{"text_hash": text_hash,
                         "canonical_doc_id": lo}])


def dedup_stream(docs: DataFrame) -> DataFrame:
    """docs(doc_id long, text string) stream -> one canonical row per
    distinct content, first-wins across micro-batches."""
    hashed = docs.select(
        F.md5(F.encode("text", "UTF-8")).alias("text_hash"), "doc_id")
    return (hashed
            .groupBy("text_hash")
            .applyInPandasWithState(
                _first_wins,
                outputStructType=DEDUP_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
