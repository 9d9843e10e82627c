"""Round-8 staged queries (queries/r8_staging.py) — oracle parity plus
semantic pins. These rows are NOT in QUERY_REGISTRY (round 7 spent its
full ≤3 addition budget); round 8 moves them onto @register, appends
the names to the round-9 deferral list, and retires this file's parity
gate in favor of the registry-wide tools/check_oracle.py sweep."""

import pathlib
import sys

import duckdb
import pytest

from market_pulse_data_pipeline_spark.queries.r8_staging import STAGED
from market_pulse_data_pipeline_spark.schemas import TESTDATA_TABLES

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


def test_staged_rows_are_not_registered():
    from market_pulse_data_pipeline_spark.queries import QUERY_REGISTRY

    assert not set(STAGED) & set(QUERY_REGISTRY)
    assert set(STAGED) == {
        "ccnet_perplexity_buckets",
        "mixture_temperature_weights",
        "winnowing_fingerprint_pairs",
    }


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    q = STAGED[name]
    sdf = q.spark(spark, sf_dir)
    s_fp = frame_fingerprint(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = duck.execute(q.oracle)
    cols = [d[0] for d in cur.description]
    o_fp = frame_fingerprint(cols, cur.fetchall())
    assert s_fp == o_fp, f"{name}: spark={s_fp} oracle={o_fp}"
    assert s_fp[0] > 0


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_plan_antipatterns(spark, sf_dir, name):
    df = STAGED[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"


def test_ccnet_buckets_are_per_lang_terciles(spark, sf_dir):
    rows = (
        STAGED["ccnet_perplexity_buckets"].spark(spark, sf_dir).collect()
    )
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
        assert r["keep"] == (r["bucket"] in ("head", "middle"))
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r["bucket"]] += 1
        # NTILE(3): bucket sizes differ by at most one, head gets extras
        assert sizes["head"] >= sizes["middle"] >= sizes["tail"], lang
        assert sizes["head"] - sizes["tail"] <= 1, lang
        assert sum(sizes.values()) == n
        # head scores <= middle scores <= tail scores (fluency order)
        mx = {
            b: max(r["mean_inv_p"] for r in rs if r["bucket"] == b)
            for b in sizes
        }
        mn = {
            b: min(r["mean_inv_p"] for r in rs if r["bucket"] == b)
            for b in sizes
        }
        assert mx["head"] <= mn["middle"] or sizes["middle"] == 0
        assert mx["middle"] <= mn["tail"] or sizes["tail"] == 0


def test_temperature_weights_redistribute_toward_rare(spark, sf_dir):
    rows = (
        STAGED["mixture_temperature_weights"].spark(spark, sf_dir).collect()
    )
    assert len(rows) >= 2
    s_p = sum(r["p_raw"] for r in rows)
    s_w = sum(r["weight"] for r in rows)
    assert abs(s_p - 1.0) < 1e-3
    assert abs(s_w - 1.0) < 1e-3
    for r in rows:
        assert 0.0 < r["weight"] < 1.0
        assert r["boost"] > 0.0
    # sqrt flattening: the rarest language is boosted at least as much
    # as the most common one (boost is monotone decreasing in p)
    by_p = sorted(rows, key=lambda r: r["p_raw"])
    assert by_p[0]["boost"] >= by_p[-1]["boost"]
    # and counts reconcile with the raw table
    n_total = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_total


def test_winnowing_guarantee_on_planted_tails(spark, sf_dir):
    from market_pulse_data_pipeline_spark.queries.r8_staging import (
        _WN_PLANT_OFFSET,
        _WN_T,
    )

    rows = (
        STAGED["winnowing_fingerprint_pairs"].spark(spark, sf_dir).collect()
    )
    assert rows
    planted_hits = {
        (r["doc_a"] - _WN_PLANT_OFFSET, r["doc_b"])
        for r in rows
        if r["doc_a"] >= _WN_PLANT_OFFSET
    }
    for r in rows:
        assert r["doc_a"] > r["doc_b"]
        assert r["n_shared"] >= _WN_T
    # the winnowing guarantee: every planted tail-extension shares its
    # whole prefix with the original, so (planted, original) must pair
    n_eligible = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        " WHERE doc_id % 31 = 0 AND len(string_split(text, ' ')) >= 8"
    ).fetchone()[0]
    self_pairs = {(o, b) for o, b in planted_hits if o == b}
    assert len(self_pairs) == n_eligible
