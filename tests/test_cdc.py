"""operators/cdc.py semantics on hand-built frames: the ordering rules
that the oracle queries exercise only statistically."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.cdc import (
    apply_changes,
    version_diff,
)


def test_version_diff_labels(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (4, "d", 40.0), (5, "e", None)],
        "k int, s string, v double",
    )
    got = {
        (r.k, r.change_type)
        for r in version_diff(old, new, ["k"]).collect()
    }
    # k=1 unchanged (dropped); k=3 null-valued row deleted; k=5 inserted
    # with a null value (null-safe comparison must not swallow either)
    assert got == {
        (2, "updated"),
        (3, "deleted"),
        (4, "inserted"),
        (5, "inserted"),
    }


def test_version_diff_null_transition_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k int, v double")
    new = spark.createDataFrame([(1, 0.0)], "k int, v double")
    rows = version_diff(old, new, ["k"]).collect()
    assert [(r.k, r.change_type) for r in rows] == [(1, "updated")]


def test_apply_changes_latest_wins(spark):
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k int, name string"
    )
    changes = spark.createDataFrame(
        [
            # delete then upsert: survives with the upsert payload
            (1, "one-v2", "delete", 10),
            (1, "one-v3", "upsert", 11),
            # upsert then delete: removed
            (2, "two-v2", "upsert", 5),
            (2, "two-v3", "delete", 6),
            # pure insert of a key not in base
            (4, "four", "upsert", 1),
        ],
        "k int, name string, op string, seq int",
    )
    out = apply_changes(base, changes, ["k"])
    got = {(r.k, r.name) for r in out.collect()}
    assert got == {(1, "one-v3"), (3, "three"), (4, "four")}
    # idempotent: replaying the same feed onto the result changes nothing
    again = apply_changes(out, changes, ["k"])
    assert {(r.k, r.name) for r in again.collect()} == got


def test_apply_changes_passthrough_schema(spark):
    base = spark.createDataFrame([(1, 1.0)], "k int, v double")
    changes = spark.createDataFrame(
        [(1, 2.0, "upsert", 1)], "k int, v double, op string, seq int"
    )
    out = apply_changes(base, changes, ["k"])
    assert out.columns == ["k", "v"]
    assert out.filter(F.col("k") == 1).collect()[0].v == 2.0
