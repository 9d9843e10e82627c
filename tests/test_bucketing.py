"""Bucketed co-located join: same result as the plain join, with ZERO
shuffle exchanges in the physical plan."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.bucketing import (
    _explain_plan_string,
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)
from market_pulse_data_pipeline_spark.sources.tables import load_table


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    spark.sql("DROP TABLE IF EXISTS bucketed.li_b")
    spark.sql("DROP TABLE IF EXISTS bucketed.ord_b")
    write_bucketed(li, "bucketed.li_b", "l_orderkey", 8, "l_orderkey")
    write_bucketed(orders, "bucketed.ord_b", "l_orderkey", 8, "l_orderkey")

    joined = bucketed_join(
        spark, "bucketed.li_b", "bucketed.ord_b", "l_orderkey", force_smj=True
    )
    # co-located: a sort-merge join with no exchange anywhere in the plan
    # (force_smj rules out the trivially-shuffle-free broadcast path)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert not plan_has_shuffle(joined), plan

    # and the result is identical to the plain join
    got = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("q"),
    ).head()
    want = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("q"),
    ).head()
    assert (got.n, got.q) == (want.n, want.q)
    spark.sql("DROP TABLE IF EXISTS bucketed.li_b")
    spark.sql("DROP TABLE IF EXISTS bucketed.ord_b")


def test_fallback_plan_string_detects_shuffle(spark):
    # ADVICE r12: the public-API fallback must render exchanges in a
    # form plan_has_shuffle's substring check detects — the formatted
    # explain mode put the partitioning on a separate Arguments: line
    # and made the shuffle guard vacuously pass. Pin the contract on
    # the fallback text directly: a groupBy plan shows hashpartitioning,
    # a scan-only plan does not.
    df = spark.range(100).groupBy((F.col("id") % 7).alias("k")).count()
    assert "hashpartitioning" in _explain_plan_string(df)
    assert "hashpartitioning" not in _explain_plan_string(spark.range(10))
