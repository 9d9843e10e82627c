"""agg_weekly_prices — weekly GROUP BY rollup (reference operators A2, A3).

Reference: ``dbt_finance/models/marts/agg_weekly_prices.sql:3-9``.
A plain groupBy (NOT a rolling window): Spark plans it as partial+final
hash aggregate, so the shuffle carries only (symbol, week) partials —
the shape that survives a 100× scale-up.

Week semantics: Snowflake WEEK_START=0 truncates to Monday; Spark
date_trunc('week') is ISO-Monday too, but returns TIMESTAMP → cast to
DATE for parity (SURVEY §2.4-A3, §2.7-e).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.scalars import week_start


def build_agg_weekly_prices(fact: DataFrame) -> DataFrame:
    return (
        fact.groupBy(
            "symbol", week_start(F.col("trading_date")).alias("week_start")
        )
        .agg(
            F.avg("close").alias("avg_close"),
            F.avg("percent_change").alias("avg_percent_change"),
        )
    )


def build_agg_weekly_ohlc(fact: DataFrame) -> DataFrame:
    """Weekly OHLC candlesticks — an additive mart beyond the reference's
    avg-only rollup (the natural resample for market data): week open =
    first trading day's open, close = last day's close, high/low =
    extremes, volume = total. first/last via min_by/max_by on
    trading_date, which is unique per (symbol, week) — one hash-aggregate
    pass, no window shuffle."""
    return fact.groupBy(
        "symbol", week_start(F.col("trading_date")).alias("week_start")
    ).agg(
        F.min_by("open", "trading_date").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "trading_date").alias("close"),
        F.sum("volume").alias("volume"),
        F.count(F.lit(1)).alias("n_trading_days"),
    )
