"""Parquet table loaders for the driver fixture tables (TESTDATA.md).

One parquet file per table; Catalyst handles predicate pushdown and
column pruning at the scan, so loaders stay plain ``spark.read.parquet``
— no options that would defeat pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from market_pulse_data_pipeline_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (mirrors the driver's
    DuckDB-side view registration, so ``spark.sql`` text can match
    ``oracle_sql`` text closely)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
