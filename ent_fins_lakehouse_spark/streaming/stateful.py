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
