"""Edge-case unit tests for queries/quality.py, queries/formats.py and
queries/incremental.py (the oracle gate checks fixture-wide equality;
these pin the per-rule semantics on crafted inputs)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_quality_rules_on_crafted_docs(spark):
    from market_pulse_data_pipeline_spark.queries.quality import (
        _MIN_WORDS,
    )

    rows = [
        # too short → rule_len False
        (1, "en", "web", "a b c"),
        # long enough, has stopword, sane word lengths → keep
        (2, "en", "web", " ".join(["the"] + ["word"] * _MIN_WORDS)),
        # long enough but no stopword → keep False via rule_stopword
        (3, "en", "web", " ".join(["word"] * (_MIN_WORDS + 1))),
        # absurd mean word length → rule_wlen False
        (4, "en", "web", " ".join(["x" * 30] * (_MIN_WORDS + 1)) + " the"),
    ]
    df = spark.createDataFrame(
        [(i, lang, src, txt, len(txt)) for i, lang, src, txt in rows],
        "doc_id long, lang string, source string, text string, n_chars long",
    )
    from market_pulse_data_pipeline_spark.queries import quality as q

    # point the module's table loader at the crafted frame
    orig = q.t
    try:
        q.t = lambda s, d, n: df  # noqa: ARG005
        out = {
            r["doc_id"]: r
            for r in q.corpus_quality_filter(spark, "ignored").collect()
        }
    finally:
        q.t = orig
    assert not out[1]["rule_len"] and not out[1]["keep"]
    assert out[2]["keep"]
    assert not out[3]["rule_stopword"] and not out[3]["keep"]
    assert not out[4]["rule_wlen"] and not out[4]["keep"]


def test_pii_redact_semantics(spark):
    df = spark.createDataFrame(
        [(1, "contact me at jane.doe@example.com or 1234567 now")],
        "doc_id long, text string",
    )
    from market_pulse_data_pipeline_spark.queries.quality import (
        _PII_EMAIL,
        _PII_ID,
    )

    after_email = F.regexp_replace("text", _PII_EMAIL, "[EMAIL]")
    redacted = F.regexp_replace(after_email, _PII_ID, "[ID]")
    row = df.select(redacted.alias("r")).head()
    assert row["r"] == "contact me at [EMAIL] or [ID] now"


def test_csv_roundtrip_quoting(spark, tmp_path):
    path = str(tmp_path / "csv")
    src = spark.createDataFrame(
        [(1, 'say "hi", ok'), (2, "plain"), (3, "comma, inside")],
        "k long, s string",
    )
    src.write.option("header", True).csv(path)
    back = (
        spark.read.schema("k long, s string").option("header", True).csv(path)
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_incremental_merge_equals_full(spark):
    from market_pulse_data_pipeline_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    merged = all_queries()["incremental_agg_maintenance"].spark(spark, sf)
    from market_pulse_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf, "events")
    full = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("value_sum"),
        )
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_gapfill_covers_span_and_fills(spark):
    base = datetime.datetime(2025, 1, 1)
    rows = [
        (1, base, 10.0),
        (1, base + datetime.timedelta(days=3), 20.0),  # gap of 2 days
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    daily = df.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("day_value"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
            "day"
        ),
    )
    from pyspark.sql import Window

    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        joined.select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("v"),
        )
        .orderBy("day")
        .collect()
    )
    assert len(out) == 4  # full calendar span
    assert [r["v"] for r in out] == [10.0, 10.0, 10.0, 20.0]  # ffill


def test_join_hints_select_intended_strategy(spark):
    from market_pulse_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    expected_node = {
        "broadcast": "BroadcastHashJoin",
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
        "shuffle_replicate_nl": "CartesianProduct",
    }
    for hint, node in expected_node.items():
        j = li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert node in plan, f"{hint}: expected {node} in plan:\n{plan[:800]}"
