"""Catalog materialization path (S6/S7 parity): CREATE DATABASE IF NOT
EXISTS + saveAsTable, staging/analytics schema split, SQL-addressable
results."""

from market_pulse_data_pipeline_spark.pipeline import build_runner, load_bronze
from market_pulse_data_pipeline_spark.sources.alphavantage import (
    default_fixture_docs,
    write_fixture_landing,
)


def test_catalog_materialization(spark, tmp_path):
    landing = str(tmp_path / "landing")
    write_fixture_landing(landing, default_fixture_docs(n_days=10))
    raw = load_bronze(spark, landing, str(tmp_path / "wh"))

    runner = build_runner(spark, str(tmp_path / "wh"))
    tables = runner.run({"raw_alphavantage": raw}, to_catalog=True)

    # the dbt schema split: staging model in `staging`, marts in `analytics`
    assert spark.catalog.tableExists("staging.stg_alphavantage")
    assert spark.catalog.tableExists("analytics.dim_stock")
    assert spark.catalog.tableExists("analytics.agg_weekly_prices")

    n_sql = spark.sql("SELECT count(*) AS n FROM staging.stg_alphavantage").head().n
    assert n_sql == tables["stg_alphavantage"].count() > 0

    joined = spark.sql(
        """
        SELECT f.symbol, count(*) AS n
        FROM analytics.fact_stock_prices f
        JOIN analytics.dim_stock d ON f.symbol = d.symbol
        GROUP BY f.symbol
        """
    ).collect()
    assert len(joined) == 10
