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
