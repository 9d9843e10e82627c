"""Salted-aggregation/join equivalence + the CLI pipeline entry."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from market_pulse_data_pipeline_spark.sources.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: (r.n, round(r.total, 2))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {
                "total": (
                    F.sum(F.col("l_quantity").cast("decimal(20,2)")),
                    F.sum("total").cast("double"),
                ),
                "n": (F.count(F.lit(1)), F.sum("n")),
            },
        ).collect()
    }
    want = {
        r.l_returnflag: (r.n, round(r.total, 2))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    got = (
        salted_broadcast_left(orders, cust, "o_custkey")
        .select("o_orderkey", "c_name")
        .collect()
    )
    want = (
        orders.join(cust, "o_custkey", "left")
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_cli_pipeline(tmp_path, capsys):
    from market_pulse_data_pipeline_spark.__main__ import main

    rc = main(
        [
            "--landing", str(tmp_path / "landing"),
            "--warehouse", str(tmp_path / "wh"),
            "--fixtures", "--days", "15",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "qc: 10/10 passed" in out
    assert "fact_stock_prices" in out
