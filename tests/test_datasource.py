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


def test_simple_stream_reader_offsets_and_replay(tmp_path):
    """The streaming reader's offset algebra, engine-free: initial
    offset sees nothing, read() picks up exactly the new files and
    advances the offset, a no-change read returns nothing, and
    readBetweenOffsets replays a committed range identically."""
    import json

    from market_pulse_data_pipeline_spark.sources.alphavantage import (
        make_fixture_doc,
    )
    from market_pulse_data_pipeline_spark.sources.datasource import (
        AlphaVantageSimpleStreamReader,
    )
    from market_pulse_data_pipeline_spark.sources.landing import (
        write_landing_doc,
    )

    landing = str(tmp_path / "landing")
    r = AlphaVantageSimpleStreamReader(landing)
    o0 = r.initialOffset()
    rows, o1 = r.read(o0)
    assert list(rows) == [] and o1 == {"seen": "[]"}

    write_landing_doc(landing, "AAPL", make_fixture_doc("AAPL", n_days=5))
    write_landing_doc(landing, "MSFT", make_fixture_doc("MSFT", n_days=7))
    rows, o2 = r.read(o1)
    batch1 = sorted(list(rows))
    assert [s for s, _, _ in batch1] == ["AAPL", "MSFT"]
    assert [n for _, _, n in batch1] == [5, 7]
    assert len(json.loads(o2["seen"])) == 2

    # nothing new → empty batch, offset unchanged
    rows, o3 = r.read(o2)
    assert list(rows) == [] and o3 == o2

    write_landing_doc(landing, "AAPL.r2", make_fixture_doc("AAPL", n_days=3))
    rows, o4 = r.read(o3)
    assert [(s, n) for s, _, n in rows] == [("AAPL", 3)]

    # recovery replay: committed range [o2, o4) re-reads exactly batch 2
    replay = [(s, n) for s, _, n in r.readBetweenOffsets(o2, o4)]
    assert replay == [("AAPL", 3)]
    # and the full range replays everything
    assert len(list(r.readBetweenOffsets(o0, o4))) == 3
