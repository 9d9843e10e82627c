"""Spark 4 Python DataSource: spark.read.format('alphavantage')."""

import pytest

from market_pulse_data_pipeline_spark.sources.alphavantage import (
    default_fixture_docs,
    write_fixture_landing,
)
from market_pulse_data_pipeline_spark.sources.datasource import (
    AlphaVantageDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(AlphaVantageDataSource)
    return spark


def test_reads_landing_documents(registered, tmp_path_factory):
    landing = str(tmp_path_factory.mktemp("ds") / "landing")
    write_fixture_landing(landing, default_fixture_docs(n_days=30))
    df = (
        registered.read.format("alphavantage").option("path", landing).load()
    )
    rows = {r.symbol: r for r in df.collect()}
    assert len(rows) == 10
    # normalization + in-document symbol (§2.7-a): BRK-B, never BRK.B
    assert "BRK-B" in rows and "BRK.B" not in rows
    assert rows["AAPL"].n_days == 30
    assert rows["MSFT"].n_days == 29  # the fixture's gap day
    # executor-side parse: one partition per document
    assert df.rdd.getNumPartitions() == 10


def test_empty_landing_yields_empty_frame(registered, tmp_path_factory):
    landing = str(tmp_path_factory.mktemp("ds_empty"))
    df = (
        registered.read.format("alphavantage").option("path", landing).load()
    )
    assert df.count() == 0
    assert df.columns == ["symbol", "data_json", "n_days"]
