"""Custom stateful streaming operator: inactivity-gap sessionization via
``applyInPandasWithState`` (the north-star 'custom stateful operators'
item — no built-in Spark operator expresses open-ended session windows
with per-key state carried across micro-batches).

State per user_id: (session_start_epoch, last_seen_epoch, n_events).
An event further than ``gap_s`` from last_seen closes the open session
(emitted) and starts a new one; a processing-time timeout flushes idle
sessions.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)

GAP_S = 1800

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),
    StructField("session_end", LongType()),
    StructField("n_events", IntegerType()),
])

_STATE_SCHEMA = "start LONG, last LONG, n INT"


def _sessionize_fn(idle_flush_ms: int):
    def _sessionize(key, batches: Iterable[pd.DataFrame],
                    state: GroupState):
        return _sessionize_impl(key, batches, state, idle_flush_ms)
    return _sessionize


def _sessionize_impl(key, batches: Iterable[pd.DataFrame],
                     state: GroupState, idle_flush_ms: int = 60_000):
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "session_start": start,
            "session_end": last, "n_events": n,
        }])
        return

    ts = []
    for pdf in batches:
        ts.extend(int(t) for t in pdf["epoch_s"])
    ts.sort()

    out = []
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    for t in ts:
        if last is not None and t - last > GAP_S:
            out.append({"user_id": user_id, "session_start": start,
                        "session_end": last, "n_events": n})
            start, n = t, 0
        if start is None:
            start = t
        last = t
        n += 1
    if start is not None:
        state.update((start, last, n))
        try:
            state.setTimeoutDuration(idle_flush_ms)
        except Exception:
            pass  # NoTimeout mode: open sessions wait for the next event
    if out:
        yield pd.DataFrame(out)


def sessionize_stream(events: DataFrame,
                      idle_flush: bool = False,
                      idle_flush_ms: int = 60_000) -> DataFrame:
    """events(user_id long, epoch_s long) stream -> closed sessions.

    ``idle_flush=True`` adds an ``idle_flush_ms`` processing-time
    timeout that force-closes idle sessions — use with a real trigger
    interval. With ``availableNow`` triggers leave it off: the engine
    keeps scheduling drain batches while any timeout is armed, so the
    drain never terminates (same caveat as dedup_stream's ttl_ms)."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_flush
               else GroupStateTimeout.NoTimeout)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(idle_flush_ms),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
