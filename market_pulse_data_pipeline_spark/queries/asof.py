"""As-of and range joins as driver-contract queries.

Neither operator exists natively in Spark; both are classic time-series
/ interval workloads (SURVEY §2.3 notes the reference has no theta or
as-of joins — these are north-star additions). The DuckDB oracles use
the engine-native forms (ASOF JOIN; a plain range-predicate join) so the
Spark implementations' bucketing/window tricks are verified against
straightforward semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join_buckets,
)
from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_sum,
    sql_round_sum,
    t,
)

_ANCHOR_MOD = 50  # every 50th event is an "anchor" state change


@register(
    "asof_join_latest_anchor",
    f"""
    WITH anchors AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ats,
             MAX(value) AS anchor_value
      FROM events WHERE event_id % {_ANCHOR_MOD} = 0
      GROUP BY 1, 2
    ), ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    )
    SELECT ev.event_id, ev.user_id, epoch_us(ev.ts) AS ts_us,
           epoch_us(a.ats) AS anchor_ts_us, a.anchor_value
    FROM ev ASOF LEFT JOIN anchors a
      ON ev.user_id = a.user_id AND ev.ts >= a.ats
    """,
    bench=True,
    doc="backward-inclusive AS-OF JOIN: each event picks up the most "
    "recent per-user anchor state at or before its timestamp. Spark side "
    "is the merge-asof pattern (union + one window pass per key — a "
    "single shuffle, no range-join blow-up); oracle is DuckDB's native "
    "ASOF JOIN. Anchors are deduped to unique (user, ts) as any as-of "
    "semantics requires; times emitted as epoch micros.",
)
def asof_join_latest_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    anchors = (
        ev.filter(F.col("event_id") % _ANCHOR_MOD == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("anchor_value"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        anchors,
        key="user_id",
        left_time="ts",
        right_time="ts",
        payload_cols=["ts", "anchor_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("asof_ts").alias("anchor_ts_us"),
        F.col("asof_anchor_value").alias("anchor_value"),
    )


_BAND_MOD = 20
_BAND_WIDTH = 40_000


@register(
    "range_join_price_bands",
    f"""
    WITH bands AS (
      SELECT p_partkey AS band_id,
             p_retailprice * 100 AS band_start,
             p_retailprice * 100 + {_BAND_WIDTH} AS band_end
      FROM part WHERE p_partkey % {_BAND_MOD} = 0
    )
    SELECT band_id, COUNT(*) AS n_orders,
           {sql_round_sum('o_totalprice', 6, 2)} AS total_price
    FROM orders JOIN bands
      ON o_totalprice >= band_start AND o_totalprice < band_end
    GROUP BY band_id
    """,
    doc="interval-containment range join (order price ∈ derived band) "
    "via fixed-width bucket expansion + equi-join — avoids the "
    "broadcast-nested-loop a pure range predicate plans. Oracle uses the "
    "plain range-predicate join; results aggregated per band.",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") % _BAND_MOD == 0)
    bands = part.select(
        F.col("p_partkey").alias("band_id"),
        (F.col("p_retailprice") * 100).alias("band_start"),
        (F.col("p_retailprice") * 100 + _BAND_WIDTH).alias("band_end"),
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    matched = range_join_buckets(
        orders, bands, "o_totalprice", "band_start", "band_end", _BAND_WIDTH
    )
    return matched.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_sum(F.col("o_totalprice"), 6, 2).alias("total_price"),
    )
