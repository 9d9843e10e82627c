"""Every registry query vs its DuckDB oracle at sf0.001 — the pytest
form of tools/check_oracle.py (the driver gate runs at sf0.01)."""

import duckdb
import pytest

from market_pulse_data_pipeline_spark.queries import all_queries
from market_pulse_data_pipeline_spark.schemas import TESTDATA_TABLES

import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tools.check_oracle import frame_fingerprint  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = all_queries()[name]
    sdf = q.spark(spark, sf_dir)
    s_fp = frame_fingerprint(sdf.columns, [tuple(r) for r in sdf.collect()])
    if q.oracle is None:
        assert s_fp[0] > 0, f"rows-only query {name} returned 0 rows"
        return
    cur = duck.execute(q.oracle)
    cols = [d[0] for d in cur.description]
    o_fp = frame_fingerprint(cols, cur.fetchall())
    assert s_fp == o_fp, f"{name}: spark={s_fp} oracle={o_fp}"
