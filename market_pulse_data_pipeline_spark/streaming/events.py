"""Event-time streaming operators over an events stream (north-star
phase 5): watermarked tumbling/sliding windows, within-watermark
dedup, session windows. None of these exist in the reference (§2.6) —
they are the additive streaming surface, kept isolated here.

Batch twins with DuckDB oracles live in queries/events.py; these
streaming forms are pytest-verified by comparing an availableNow run
against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling (or sliding, if ``slide``) window counts per
    event_type. State is bounded by the watermark: late rows beyond it
    are dropped instead of growing state forever."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon — the streaming
    twin of the batch row_number dedup (J3). State for a key is dropped
    once the watermark passes it."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Gap-based session windows per user (the streaming counterpart of
    queries.events.sessionization), via the built-in session_window
    generator — stateful, watermark-bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    watermark: str = "30 minutes",
    bound: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join within an event-time interval: each left
    row pairs with right rows for the same key whose time lies in
    [left.ts, left.ts + bound]. Both sides carry watermarks and the join
    condition carries the time bound, so each side's buffered state is
    bounded by watermark + bound — the requirement for a stream-stream
    join to be runnable at all (unbounded joins would buffer forever).

    Typical use: attribute conversions (right) to the triggering event
    (left) within an attribution window.

    ``how='leftOuter'`` additionally emits every left row whose join
    window closed with no match — but only once the global watermark
    (the MIN across both streams' watermarks) passes the window's end:
    unmatched rows near the head of the stream stay buffered forever
    on an unbounded stream, and under availableNow they are emitted by
    the final no-data batch iff left.ts + bound < min-watermark. That
    eviction discipline is exactly what makes outer stream-stream
    joins runnable at all (state is dropped, not kept until job end).
    """
    left_wm = left.withWatermark("ts", watermark).alias("l")
    right_wm = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.ts >= l.ts AND r.ts <= l.ts + interval {bound}"
    )
    return left_wm.join(right_wm, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.ts").alias("right_ts"),
    )
