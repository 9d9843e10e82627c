"""HLL approximate distinct: relative error bounded vs the exact count."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries import all_queries
from market_pulse_data_pipeline_spark.sources.tables import load_table


def test_approx_distinct_within_error(spark, sf_dir):
    # the query's hash-checked contract: its own exact counts match a
    # direct countDistinct, and every group's HLL estimate sits within
    # the band the query asserts (approx_within_band pinned True)
    rows = all_queries()["approx_distinct_parts"].spark(spark, sf_dir).collect()
    got = {r.l_suppkey: r.exact_parts for r in rows}
    exact = {
        r.l_suppkey: r.d
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert got == exact
    assert all(r.approx_within_band for r in rows)
