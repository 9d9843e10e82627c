"""fact_stock_prices — left-join enrichment + derived metrics
(reference operators J1, P7, P8, P9).

Reference: ``dbt_finance/models/marts/fact_stock_prices.sql:8-28``.
The dim side is ≤10 rows, so the left join is explicitly broadcast —
at 100 TB of fact rows this must never become a shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.scalars import nullif_zero


def build_fact_stock_prices(stg: DataFrame, dim: DataFrame) -> DataFrame:
    enriched = stg.join(F.broadcast(dim), on="symbol", how="left")
    return enriched.select(
        "symbol",
        "trading_date",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "company_name",
        "sector",
        # fact_stock_prices.sql:20-21
        F.round(F.col("close") - F.col("open"), 2).alias("daily_change"),
        F.round(
            (F.col("close") - F.col("open")) / nullif_zero(F.col("open")) * 100.0, 2
        ).alias("percent_change"),
    )
