"""Driver-contract query registry.

Each entry pairs a Spark DataFrame implementation with an equivalent
ANSI-SQL oracle that DuckDB runs on the same parquet tables
(CORRECTNESS gate, see /root/repo/__spark_entry__.py). Column names and
types are aligned on both sides; float aggregates go through an exact
decimal sum so the value-hash is independent of partial-aggregation
order (see queries.common).
"""

from __future__ import annotations

from market_pulse_data_pipeline_spark.queries.common import QUERY_REGISTRY, QueryDef  # noqa: F401

# importing the modules registers their queries
from market_pulse_data_pipeline_spark.queries import reference  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import tpch  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import text  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import dedup  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import similarity  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import events  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import scale_paths  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import analytics  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import asof  # noqa: F401, E402


def all_queries():
    return dict(QUERY_REGISTRY)
