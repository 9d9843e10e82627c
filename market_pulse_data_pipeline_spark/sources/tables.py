"""Parquet table loaders for the driver fixture tables (TESTDATA.md).

One parquet file per table; Catalyst handles predicate pushdown and
column pruning at the scan, so loaders stay plain ``spark.read.parquet``
— no options that would defeat pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.schemas import TESTDATA_TABLES

# parquet TIMESTAMP(NANOS) columns (read as long via
# spark.sql.legacy.parquet.nanosAsLong) that must come back as timestamps
_NANOS_TS_COLUMNS = {"events": ["ts"]}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs for sessions we didn't build (the driver
    constructs its own): nanos-parquet readability and UTC semantics for
    timestamp↔local conversions (matches the DuckDB oracle's naive
    timestamps). Both are runtime-settable SQLConfs; idempotent."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if spark.conf.get(key, None) != val:
            spark.conf.set(key, val)
        # loud, not silent: a session where these can't stick would read
        # nanos parquet wrong / emit tz-shifted timestamps downstream
        got = spark.conf.get(key, None)
        if got != val:
            raise RuntimeError(
                f"required session conf {key}={val!r} did not stick (got {got!r})"
            )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            # integer division — a double roundtrip would lose microseconds
            # at nanosecond epoch magnitudes (~1.7e18 > 2^53)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (mirrors the driver's
    DuckDB-side view registration, so ``spark.sql`` text can match
    ``oracle_sql`` text closely)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
