"""As-of join and bucketed range join — edge semantics on handcrafted
frames (the registered queries carry the DuckDB oracle at scale)."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join_buckets,
)


def _left(spark):
    return spark.createDataFrame(
        [(1, 5, "e1"), (1, 10, "e2"), (1, 20, "e3"), (2, 7, "e4")],
        "k bigint, t bigint, name string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (3, 1, 999.0)],
        "k bigint, t bigint, v double",
    )


def test_asof_backward_inclusive(spark):
    out = {
        r.name: (r.asof_t, r.asof_v)
        for r in asof_join(
            _left(spark),
            _right(spark),
            key="k",
            left_time="t",
            right_time="t",
            payload_cols=["t", "v"],
        ).collect()
    }
    # e1 at t=5: no right row at or before → NULL
    assert out["e1"] == (None, None)
    # e2 at t=10: right row AT t=10 matches (inclusive)
    assert out["e2"] == (10, 100.0)
    # e3 at t=20: latest right row before is t=15
    assert out["e3"] == (15, 150.0)
    # key 2 has no right rows at all
    assert out["e4"] == (None, None)


def test_asof_left_rows_preserved(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        key="k",
        left_time="t",
        right_time="t",
        payload_cols=["v"],
    )
    assert out.count() == 4
    assert set(out.columns) == {"k", "t", "name", "asof_v"}


def test_range_join_buckets_matches_predicate_join(spark):
    points = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(200)], "pid bigint, x double"
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 35.0), (3, 90.0, 100.0), (4, 50.0, 50.0)],
        "iid bigint, s double, e double",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_buckets(points, intervals, "x", "s", "e", 10).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in points.join(
            intervals, (F.col("x") >= F.col("s")) & (F.col("x") < F.col("e"))
        ).collect()
    }
    assert got == want and got  # identical and non-empty
    # empty interval [50, 50) matches nothing
    assert not any(i == 4 for _, i in got)
