"""stg_alphavantage — flatten + cast (reference operators P1-P4, A1, P12).

Reference: ``dbt_finance/models/staging/stg_alphavantage.sql:10-21``:
Snowflake ``LATERAL FLATTEN(input => DATA:"Time Series (Daily)")`` plus
``::date/::float/::int`` casts. Spark's ``explode`` on a MapType column is
an exact semantic match for FLATTEN of an object (generator ≈ UDTF), and
it stays entirely JVM-side (GenerateExec inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_alphavantage(raw: DataFrame) -> DataFrame:
    """raw(symbol, data struct, ...) → one typed row per (symbol, trading_date).

    Leaf values arrive as strings (the API emits quoted numerics); all
    typing happens here, mirroring stg_alphavantage.sql:13-18. Volume is
    LongType — Snowflake ::int is NUMBER(38,0), not int32 (SURVEY §2.7-f).
    """
    series = F.col("data").getField("Time Series (Daily)")
    exploded = raw.where(series.isNotNull()).select(
        "symbol", F.explode(series).alias("k", "v")
    )
    return exploded.select(
        F.col("symbol"),
        F.to_date("k").alias("trading_date"),
        F.col("v").getField("1. open").cast("double").alias("open"),
        F.col("v").getField("2. high").cast("double").alias("high"),
        F.col("v").getField("3. low").cast("double").alias("low"),
        F.col("v").getField("4. close").cast("double").alias("close"),
        F.col("v").getField("5. volume").cast("long").alias("volume"),
    )
