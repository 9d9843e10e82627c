"""Semantic pins for the round-13 staged operator
(queries/r12_staging.py). Oracle parity is covered by check_oracle
--staging at sf0.001/0.01/0.1 and hostile_check --chaos --staging;
this file keeps the funnel algebra the value-hash can't express."""

import pytest

from market_pulse_data_pipeline_spark.queries.r12_staging import (
    _YF_EVAL_MOD,
    STAGED,
)

R12_NAMES = ["corpus_yield_funnel"]


def test_r12_staging_composition():
    from market_pulse_data_pipeline_spark.queries import (
        QUERY_REGISTRY,
        staging_candidates,
    )

    assert list(STAGED) == R12_NAMES
    assert not set(STAGED) & set(QUERY_REGISTRY)
    assert set(STAGED) <= staging_candidates().keys()
    assert all(d.oracle is not None for d in STAGED.values())


def test_r12_plan_antipatterns(spark, sf_dir):
    df = STAGED["corpus_yield_funnel"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


@pytest.fixture(scope="module")
def funnel_rows(spark, sf_dir):
    return {
        r.source: r
        for r in STAGED["corpus_yield_funnel"].spark(spark, sf_dir).collect()
    }


def test_funnel_is_monotone_per_domain(funnel_rows):
    assert len(funnel_rows) == 20
    for r in funnel_rows.values():
        assert r.n_raw >= r.n_after_dedup >= r.n_after_quality
        assert r.n_after_quality >= r.n_after_decontam >= 0
        assert (r.tokens_out > 0) == (r.n_after_decontam > 0)


def test_funnel_totals_match_corpus_level_counts(funnel_rows, sf_dir):
    import duckdb

    con = duckdb.sql(
        f"""
        SELECT COUNT(*),
               COUNT(DISTINCT md5(text))
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE doc_id % {_YF_EVAL_MOD} <> 0
        """
    ).fetchone()
    n_train, n_distinct = con
    assert sum(r.n_raw for r in funnel_rows.values()) == n_train
    # dedup survivors across all domains = distinct train texts
    assert sum(r.n_after_dedup for r in funnel_rows.values()) == n_distinct


def test_funnel_stages_actually_drop_something(funnel_rows):
    # the raw fixture has NO exact duplicates (the dedup operators
    # plant their own), so the dedup stage passes everything through —
    # the quality stage is where the fixture's real attrition lives
    # (sub-20-token docs + low-stopword docs)
    total_dedup = sum(r.n_after_dedup for r in funnel_rows.values())
    total_quality = sum(r.n_after_quality for r in funnel_rows.values())
    assert total_quality < total_dedup
