"""HLL approximate distinct: relative error bounded vs the exact count."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries import all_queries
from market_pulse_data_pipeline_spark.sources.tables import load_table


def test_approx_distinct_within_error(spark, sf_dir):
    approx = {
        r.l_suppkey: r.approx_parts
        for r in all_queries()["approx_distinct_parts"].spark(spark, sf_dir).collect()
    }
    exact = {
        r.l_suppkey: r.d
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, d in exact.items():
        rel = abs(approx[k] - d) / max(d, 1)
        assert rel <= 0.15, f"supplier {k}: approx={approx[k]} exact={d} rel={rel}"
