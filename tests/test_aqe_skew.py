"""AQE skew-join splitting (OptimizeSkewedJoin): a reducer partition
holding a hot key is split into per-mapper chunks at runtime, so one
straggler task becomes many parallel ones — the no-code-change answer
to join skew that operators/skew.py's manual salting predates.

Two things are pinned here:

1. The split actually fires (final adaptive plan marks the hot side's
   AQEShuffleRead "skewed") AND is semantically transparent (identical
   aggregate with the rule on and off).
2. The granularity gotcha: splits happen at MAP-OUTPUT boundaries, so
   a child stage with one mapper (e.g. a single small parquet file)
   cannot be split at all — at test scale an upstream repartition is
   required to create mappers. At 100 TB this is free (thousands of
   mappers per stage); the test documents why toy reproductions of
   skew handling silently no-op.

Default thresholds (256 MB skewed-partition floor) are cluster-sized
and never fire at test scale, so the test lowers them; the production
session inherits the defaults, which is correct.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@pytest.fixture
def skew_spark(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark, n_mappers: int):
    # half of all (8x-exploded) lineitem rows land on hot key 0; the
    # upstream repartition fixes the join-shuffle's mapper count
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .repartition(n_mappers)
        .withColumn("dup", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn(
            "k",
            F.when(F.col("l_orderkey") % 2 != 0, F.lit(0)).otherwise(
                F.col("l_orderkey")
            ),
        )
    )
    od = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.col("o_orderkey").alias("k"), "o_totalprice")
        .repartition(n_mappers)
    )
    return li.join(od, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,6)"))
        .cast("double")
        .alias("qty"),
    )


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_split_fires_and_is_transparent(skew_spark):
    df = _skewed_join(skew_spark, n_mappers=16)
    with_skew = df.collect()[0]
    assert "skewed" in _final_plan(df), _final_plan(df)

    skew_spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        df_off = _skewed_join(skew_spark, n_mappers=16)
        without = df_off.collect()[0]
        assert "skewed" not in _final_plan(df_off)
    finally:
        skew_spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert (with_skew.n, with_skew.qty) == (without.n, without.qty)


def test_skew_split_needs_mapper_granularity(skew_spark):
    # same hot key, but the single-file scan yields one mapper: the
    # reducer partition has no map-output boundaries to split on, so
    # the rule must (and does) leave the plan alone
    li = (
        skew_spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .withColumn("dup", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn(
            "k",
            F.when(F.col("l_orderkey") % 2 != 0, F.lit(0)).otherwise(
                F.col("l_orderkey")
            ),
        )
    )
    od = skew_spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("k")
    )
    df = li.join(od, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
    df.collect()
    assert "skewed" not in _final_plan(df)
