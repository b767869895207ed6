"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful streaming is the built-in aggregation
(`Instructor/01-Fraud-Delta.py:175-181`); this is the extension surface
for operators Spark's built-ins can't express — arbitrary per-key
state machines over an unbounded stream. State lives in the state
store (per-partition on executors, checkpointed per microbatch), so
the operator scales horizontally with the key space.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

USER_STATS_OUTPUT = "user_id LONG, n_events LONG, min_value DOUBLE, max_value DOUBLE"
USER_STATS_STATE = "n LONG, mn DOUBLE, mx DOUBLE"


def _user_stats_fn(key, pdfs: Iterable[pd.DataFrame], state):
    """Running (count, min, max) per user — a tiny state machine kept
    deliberately order-insensitive so results are identical under any
    batch split."""
    if state.exists:
        n, mn, mx = state.get
    else:
        n, mn, mx = 0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        bmn = float(pdf["value"].min())
        bmx = float(pdf["value"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, mn, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "min_value": [mn], "max_value": [mx]}
    )


def user_stats_stream(events_stream: DataFrame) -> DataFrame:
    """Group the event stream by user and run the custom state
    machine. Update output mode: one row per user per microbatch that
    touched it — downstream takes the latest per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- r6:
# streaming heavy hitters (space-saving, Metwally et al. 2005)

HH_OUTPUT = "event_type STRING, rank INT, user_id LONG, est LONG, err LONG, n_seen LONG"
HH_STATE = "ks ARRAY<LONG>, cs ARRAY<LONG>, es ARRAY<LONG>, n LONG"

HH_CAPACITY = 32
HH_TOPK = 5


def _heavy_hitters_fn(key, pdfs: Iterable[pd.DataFrame], state):
    """Space-saving top-k per stream key: a fixed m-entry summary —
    increment tracked keys; insert new keys while room; otherwise the
    minimum-count entry is EVICTED and the newcomer inherits its count
    as both estimate floor and error bound. Guarantees (classic):
    ``est >= true``, ``est - err <= true``, and every key with true
    count > n/m is present. State is three parallel arrays + the
    stream length — KBs per key, independent of cardinality, which is
    the whole point at 100 TB: per-key state stays bounded while the
    user domain is unbounded.

    Batches are PRE-AGGREGATED with value_counts before touching the
    summary, so the Python loop runs over per-batch distinct keys,
    not rows (the mergeable space-saving increment: bulk-add c, evict
    with inherited error)."""
    if state.exists:
        ks, cs, es, n = state.get
        ks, cs, es = list(ks), list(cs), list(es)
    else:
        ks, cs, es, n = [], [], [], 0
    pos = {kk: i for i, kk in enumerate(ks)}
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        vc = pdf["user_id"].value_counts()
        n += int(vc.sum())
        for u, c in vc.items():
            u, c = int(u), int(c)
            i = pos.get(u)
            if i is not None:
                cs[i] += c
            elif len(ks) < HH_CAPACITY:
                pos[u] = len(ks)
                ks.append(u)
                cs.append(c)
                es.append(0)
            else:
                i = min(range(len(cs)), key=cs.__getitem__)
                pos.pop(ks[i], None)
                pos[u] = i
                es[i] = cs[i]
                cs[i] += c
                ks[i] = u
    state.update((ks, cs, es, n))
    order = sorted(range(len(ks)), key=lambda i: (-cs[i], ks[i]))[:HH_TOPK]
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(order),
            "rank": list(range(len(order))),
            "user_id": [ks[i] for i in order],
            "est": [cs[i] for i in order],
            "err": [es[i] for i in order],
            "n_seen": [n] * len(order),
        }
    )


def heavy_hitters_stream(events_stream: DataFrame) -> DataFrame:
    """Top users per event type over an unbounded stream, in constant
    state per key. Update mode — downstream keeps the latest emission
    per (event_type)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("event_type").applyInPandasWithState(
        _heavy_hitters_fn,
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- r6:
# inactivity finalization via processing-time state TTL

INACT_OUTPUT = "user_id LONG, n_events LONG, total_value DOUBLE, finalized BOOLEAN"
INACT_STATE = "n LONG, total DOUBLE"


def _inactivity_fn(key, pdfs: Iterable[pd.DataFrame], state):
    """Session finalization on inactivity — the state-TTL pattern
    (abandoned carts, closed tickets, quiet sensors): every batch with
    data for the key updates running totals and re-arms a
    processing-time timeout; when a batch passes with NO data for the
    key, the expired callback emits the FINAL row and clears state —
    bounding the state store to currently-active keys, the property
    that keeps an unbounded key domain viable."""
    if state.hasTimedOut:
        n, total = state.get
        state.remove()  # free the slot: state size tracks ACTIVE keys
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "finalized": [True],
            }
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(1)  # 1 ms: any later batch finalizes idle keys
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "finalized": [False],
        }
    )


def inactivity_sessions_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals that FINALIZE when the user goes quiet
    (processing-time state TTL). Update mode."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _inactivity_fn,
        outputStructType=INACT_OUTPUT,
        stateStructType=INACT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
