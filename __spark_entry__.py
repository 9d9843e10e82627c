"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (weekly rollup, the agg_weekly_prices
  analog) on /root/testdata/sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY.md §2
  plus the north-star extensions (text / dedup / similarity / events).
- ``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query.

Implementations live in ``market_pulse_data_pipeline_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_pulse_data_pipeline_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["weekly_rollup"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
