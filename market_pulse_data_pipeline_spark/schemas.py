"""Explicit schemas for every zone of the medallion layout.

The reference's data model (SURVEY.md §1):

- landing: one Alpha Vantage ``TIME_SERIES_DAILY`` JSON document per
  symbol (reference: ``dags/get_stock.py:86,99-104``) — field names contain
  spaces/dots/digits, so schemas are always explicit, never inferred.
- raw: ``RAW_ALPHAVANTAGE(SYMBOL, DATA VARIANT, LOAD_DATE)``
  (reference DDL: ``dags/minio_to_snowflake.py:42-48``).
- staging: one row per (symbol, trading_date) with typed OHLCV
  (reference: ``dbt_finance/models/staging/stg_alphavantage.sql:10-21``).
- marts: dim_stock / fact_stock_prices / agg_weekly_prices
  (reference: ``dbt_finance/models/marts/*.sql``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- landing/raw: the Alpha Vantage document --------------------------------

OHLCV_FIELDS = ["1. open", "2. high", "3. low", "4. close", "5. volume"]

# Leaf numerics stay STRING at the edge; all typing happens in staging,
# mirroring the reference where casts live in stg_alphavantage.sql:13-18.
DAY_BAR_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in OHLCV_FIELDS]
)

META_DATA_SCHEMA = T.StructType(
    [
        T.StructField("1. Information", T.StringType(), True),
        T.StructField("2. Symbol", T.StringType(), True),
        T.StructField("3. Last Refreshed", T.StringType(), True),
        T.StructField("4. Output Size", T.StringType(), True),
        T.StructField("5. Time Zone", T.StringType(), True),
    ]
)

# "Time Series (Daily)" is a MAP keyed by date string, not an array —
# exactly what Snowflake LATERAL FLATTEN consumes (stg_alphavantage.sql:19-20).
ALPHAVANTAGE_DOC_SCHEMA = T.StructType(
    [
        T.StructField("Meta Data", META_DATA_SCHEMA, True),
        T.StructField(
            "Time Series (Daily)",
            T.MapType(T.StringType(), DAY_BAR_SCHEMA),
            True,
        ),
    ]
)

# raw zone: VARIANT ≈ parsed struct (we also keep the raw JSON string so the
# bronze table is lossless, like Snowflake's VARIANT column).
RAW_ALPHAVANTAGE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("data", ALPHAVANTAGE_DOC_SCHEMA, True),
        T.StructField("data_json", T.StringType(), True),
        T.StructField("load_date", T.TimestampType(), True),
    ]
)

# --- staging / marts ---------------------------------------------------------

STG_ALPHAVANTAGE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("trading_date", T.DateType(), True),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        # Snowflake ::int is NUMBER(38,0) — LongType, not int32 (SURVEY §2.7-f)
        T.StructField("volume", T.LongType(), True),
    ]
)

DIM_STOCK_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("company_name", T.StringType(), True),
        T.StructField("sector", T.StringType(), True),
    ]
)

FACT_STOCK_PRICES_SCHEMA = T.StructType(
    STG_ALPHAVANTAGE_SCHEMA.fields
    + [
        T.StructField("company_name", T.StringType(), True),
        T.StructField("sector", T.StringType(), True),
        T.StructField("daily_change", T.DoubleType(), True),
        T.StructField("percent_change", T.DoubleType(), True),
    ]
)

AGG_WEEKLY_PRICES_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("week_start", T.DateType(), True),
        T.StructField("avg_close", T.DoubleType(), True),
        T.StructField("avg_percent_change", T.DoubleType(), True),
    ]
)

# --- driver fixture tables (TESTDATA.md) -------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
