"""Streaming exact dedup: keep the FIRST document per content hash
across micro-batches via ``applyInPandasWithState`` (no built-in Spark
operator expresses cross-batch first-wins dedup with bounded state —
dropDuplicates on a stream keeps unbounded state with no count/lineage).

State per content hash: the canonical_doc_id. The first arrival in
stream order (ties within a batch: lowest doc_id, matching the batch
operator's min(doc_id) canonicalization) is emitted as the canonical
row; later copies emit nothing and leave state untouched — append-mode
output can't revise a row, so a running copy-counter would be
write-only state (the batch operator exact_duplicates is the one that
reports n_copies).

Scale note: state size is one (hash, long) entry per DISTINCT
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
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

DEDUP_SCHEMA = StructType([
    StructField("text_hash", StringType()),
    StructField("canonical_doc_id", LongType()),
])

_STATE_SCHEMA = "canonical LONG"


def _first_wins_fn(ttl_ms: int | None):
    def _first_wins(key, batches: Iterable[pd.DataFrame],
                    state: GroupState):
        (text_hash,) = key
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # retention expired: forget this content hash
            return
        ids: list[int] = []
        for pdf in batches:
            ids.extend(int(d) for d in pdf["doc_id"])
        if not ids:
            return
        if state.exists:
            if ttl_ms is not None:
                # sliding retention: seeing the content again re-arms
                # the clock (timeouts must be re-registered per batch)
                state.setTimeoutDuration(ttl_ms)
            return  # duplicate: no new canonical row, no state churn
        lo = min(ids)
        state.update((lo,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame([{"text_hash": text_hash,
                             "canonical_doc_id": lo}])
    return _first_wins


def dedup_stream(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """docs(doc_id long, text string) stream -> one canonical row per
    distinct content, first-wins across micro-batches.

    ``ttl_ms`` bounds state retention at crawl scale (the module
    docstring's 10^12-doc knob, code since round 5): a content hash not
    seen for ttl_ms of processing time is dropped from the state store
    (sliding — re-arrival re-arms it), so the store tracks the ACTIVE
    dedup horizon instead of every hash ever seen. After expiry the
    same content would be re-emitted as a fresh canonical row — pick
    the horizon to match the recrawl cycle. None (default) keeps state
    forever (the exact batch-parity semantics).

    CAVEAT: processing-time timeouts need a CONTINUOUS trigger
    (processingTime=...) to fire; under trigger(availableNow=True) the
    engine keeps scheduling drain batches while any timeout is armed —
    the drain never terminates. Use ttl_ms only on long-running
    queries, never on drain-style runs."""
    hashed = docs.select(
        F.md5(F.encode("text", "UTF-8")).alias("text_hash"), "doc_id")
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (hashed
            .groupBy("text_hash")
            .applyInPandasWithState(
                _first_wins_fn(ttl_ms),
                outputStructType=DEDUP_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))


# -- streaming NEAR-duplicate detection (MinHash-LSH state) ------------------

NEAR_DUP_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("dup_of", LongType()),
    StructField("est_jaccard", DoubleType()),
    StructField("band", IntegerType()),
])

# per-bucket state: parallel arrays — member doc ids + their flattened
# minhash signatures (N_MINHASH values per doc)
_NEAR_STATE_SCHEMA = "doc_ids ARRAY<LONG>, sigs ARRAY<LONG>"

# LSH bucket membership is content-hash bounded (the same argument as
# the batch operator), but a pathological bucket must not grow state
# unboundedly: older members beyond the cap stop receiving new flags
_MAX_BUCKET_STATE = 64


def _near_dup_fn(ttl_ms: int | None):
    def _near_dup(key, batches: Iterable[pd.DataFrame],
                  state: GroupState):
        return _near_dup_impl(key, batches, state, ttl_ms)
    return _near_dup


def _near_dup_impl(key, batches: Iterable[pd.DataFrame],
                   state: GroupState, ttl_ms: int | None = None):
    from ..analytics.dedup import N_MINHASH

    threshold = 0.5
    band = int(key[0])
    if ttl_ms is not None and state.hasTimedOut:
        state.remove()  # bucket idle past the dedup horizon: forget it
        return
    arrivals: list[tuple[int, list[int]]] = []
    for pdf in batches:
        for did, sig in zip(pdf["doc_id"], pdf["sig"]):
            arrivals.append((int(did), [int(x) for x in sig]))
    if not arrivals:
        return
    arrivals.sort()  # deterministic within-batch order: doc_id asc
    if state.exists:
        doc_ids, flat = state.get
        doc_ids = list(doc_ids)
        sigs = [list(flat[i * N_MINHASH:(i + 1) * N_MINHASH])
                for i in range(len(doc_ids))]
    else:
        doc_ids, sigs = [], []
    out = []
    for did, sig in arrivals:
        best_j, best_of = 0.0, None
        for prev_id, prev_sig in zip(doc_ids, sigs):
            if prev_id == did:
                continue
            j = sum(a == b for a, b in zip(sig, prev_sig)) / N_MINHASH
            # earliest (lowest-id) match wins ties
            if j > best_j or (j == best_j and best_of is not None
                              and prev_id < best_of):
                best_j, best_of = j, prev_id
        if best_of is not None and best_j >= threshold:
            out.append({"doc_id": did, "dup_of": best_of,
                        "est_jaccard": round(best_j, 6), "band": band})
        if len(doc_ids) < _MAX_BUCKET_STATE:
            doc_ids.append(did)
            sigs.append(sig)
    state.update((doc_ids, [x for s in sigs for x in s]))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)  # sliding retention per batch
    if out:
        yield pd.DataFrame(out)


def near_dedup_stream(docs: DataFrame,
                      ttl_ms: int | None = None) -> DataFrame:
    """docs(doc_id long, text string) stream -> near-duplicate flags
    ACROSS micro-batches: MinHash signatures (same permutations as the
    batch operator, analytics.dedup.with_minhash) band into LSH bucket
    keys; ``applyInPandasWithState`` keeps each bucket's member
    signatures in the state store, so a document arriving in a LATER
    micro-batch is flagged against the earlier member with the highest
    estimated jaccard (signature agreement fraction >= 0.5).

    A pair colliding in several bands yields one flag per band —
    ``select('doc_id','dup_of').distinct()`` (or a downstream exact
    rerank, as in the batch pipeline) collapses them. State is
    graph-bucket-sized and capped per bucket (_MAX_BUCKET_STATE);
    ``ttl_ms`` additionally drops buckets idle past the dedup horizon
    (sliding processing-time retention, same contract as
    dedup_stream)."""
    from ..analytics.dedup import N_MINHASH, banded_keys, with_minhash

    sig = with_minhash(docs).withColumn(
        "sig", F.array(*[F.col(f"mh{j}") for j in range(N_MINHASH)]))
    # banded_keys = the single bucket encoding shared with the batch
    # operator and the persistable index (bucket-compatibility matters:
    # a stream can warm-start from batch state)
    banded = banded_keys(sig, "doc_id", "sig")
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (banded
            .groupBy("band", "bucket")
            .applyInPandasWithState(
                _near_dup_fn(ttl_ms),
                outputStructType=NEAR_DUP_SCHEMA,
                stateStructType=_NEAR_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
