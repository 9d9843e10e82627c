"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running aggregate (event count + value sum + last-seen
timestamp) maintained across micro-batches with explicit state.

This is the escape hatch for semantics the built-in windowed aggregates
can't express (cross-batch custom state machines); state is keyed by
user_id and Arrow-batched per group.

State lifetime: with ``state_ttl=None`` (default) state is kept for the
lifetime of the query — appropriate for bounded key domains (e.g. a
fixed user population). For unbounded key domains pass an event-time
TTL (e.g. ``"1 hour"``): when the watermark passes ``last event +
state_ttl`` the group times out, its state is removed, and a later
event for the same key starts a fresh accumulator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)

_UNITS_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _duration_ms(spec: str) -> int:
    """'30 minutes' / '1 hour' → milliseconds (the subset of Spark's
    duration syntax this operator needs)."""
    qty_s, unit = spec.strip().split()
    unit = unit.rstrip("s")
    if unit not in _UNITS_MS:
        raise ValueError(f"unsupported duration unit in {spec!r}")
    return int(qty_s) * _UNITS_MS[unit]


def running_user_stats(
    events: DataFrame,
    watermark: str = "30 minutes",
    state_ttl: str | None = None,
) -> DataFrame:
    """events(user_id, ts, value, ...) stream → one updated stats row per
    user per micro-batch, accumulated across batches in GroupState.

    ``state_ttl=None`` → state is never evicted (bounded key domains
    only). With a TTL, eviction uses EventTimeTimeout: the timeout
    timestamp is re-armed at ``last event + state_ttl`` on every update,
    and fires once the watermark passes it (so eviction is governed by
    event time, never wall clock).
    """
    ttl_ms = _duration_ms(state_ttl) if state_ttl is not None else None

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_event + ttl: drop the accumulator
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "total_value": pd.Series(dtype="float64"),
                    "last_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
            return
        if state.exists:
            n, total, last_us = state.get
        else:
            n, total, last_us = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_us = max(
                    last_us, int(pdf["ts"].astype("int64").max()) // 1000
                )
        state.update((n, total, last_us))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(last_us // 1000 + ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
