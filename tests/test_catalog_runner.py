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


def test_pointer_swap_materialization(spark, tmp_path):
    """commit_protocol='pointer': models land under immutable version
    prefixes with a _CURRENT pointer; a re-run flips the pointer while
    the prior version stays readable; read_current resolves correctly."""
    import os

    from market_pulse_data_pipeline_spark.operators.merge import read_current
    from market_pulse_data_pipeline_spark.pipeline import build_runner, load_bronze

    landing = str(tmp_path / "landing")
    write_fixture_landing(landing, default_fixture_docs(n_days=10))
    raw = load_bronze(spark, landing, str(tmp_path / "wh"))

    runner = build_runner(spark, str(tmp_path / "wh"))
    runner.commit_protocol = "pointer"
    tables = runner.run({"raw_alphavantage": raw})
    n1 = tables["stg_alphavantage"].count()
    assert n1 > 0

    stg_root = runner.table_path("stg_alphavantage")
    assert os.path.exists(os.path.join(stg_root, "_CURRENT"))
    assert read_current(spark, stg_root).count() == n1

    # second run: pointer flips, both versions on disk until vacuum
    tables2 = runner.run({"raw_alphavantage": raw})
    assert tables2["stg_alphavantage"].count() == n1
    versions = [v for v in os.listdir(stg_root) if v.startswith("v_")]
    assert len(versions) == 2
    assert read_current(spark, stg_root).count() == n1
