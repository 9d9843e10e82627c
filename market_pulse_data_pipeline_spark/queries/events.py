"""Event-time operators over `events` — the batch-equivalent shapes of
the streaming module (tumbling windows, sessionization). The streaming
variants (watermarks, applyInPandasWithState) live in streaming/ and are
pytest-verified; these batch forms carry the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_sum,
    sql_round_sum,
    t,
)

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@register(
    "event_hourly_windows",
    f"""
    SELECT event_type,
           epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_start_us,
           COUNT(*) AS n_events,
           {sql_round_sum('value', 6, 4)} AS total_value
    FROM events GROUP BY 1, 2
    """,
    bench=True,
    doc="tumbling event-time window (batch form of the streaming windowed "
    "agg): 1h buckets per event_type. Bucket start emitted as epoch micros "
    "— render-independent compared bytes.",
)
def event_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_start_us"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        round_sum(F.col("value"), 6, 4).alias("total_value"),
    )


@register(
    "event_sliding_windows",
    f"""
    WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    exploded AS (
      SELECT event_type, value,
             UNNEST([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
             ts
      FROM ev
    )
    SELECT epoch_us(window_start) AS window_start_us,
           epoch_us(window_start + INTERVAL 2 HOUR) AS window_end_us,
           event_type, COUNT(*) AS n_events,
           {sql_round_sum('value', 6, 4)} AS total_value
    FROM exploded
    WHERE ts >= window_start AND ts < window_start + INTERVAL 2 HOUR
    GROUP BY 1, 2, 3
    """,
    doc="sliding event-time windows (2h size, 1h slide): each event lands "
    "in two overlapping buckets — Spark's window() generator vs an "
    "explicit UNNEST-over-offsets oracle. Bounds emitted as epoch micros "
    "— render-independent compared bytes.",
)
def event_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_sum(F.col("value"), 6, 4).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sessionization",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us
    FROM sessions GROUP BY 1, 2
    """,
    bench=True,
    doc="gap-based sessionization (30 min) via lag + running sum — the "
    "batch twin of the stateful streaming session operator. Session "
    "bounds are emitted as epoch-microsecond longs so the compared bytes "
    "cannot depend on the harness's timestamp rendering (session/process "
    "timezone, Arrow collection path, parquet nanos reader mode) — the "
    "round-1 driver hash mismatch was exactly such an environment "
    "sensitivity on raw-precision MIN/MAX timestamps.",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(
            prev_us.isNull() | ((us - prev_us) > _SESSION_GAP_US), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(running))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )
