"""Relevance scoring (queries/relevance.py): semantic pins + the
top-k physical-plan shape."""

import pytest

from market_pulse_data_pipeline_spark.queries.relevance import (
    _QUERY_TERMS,
    bm25_score_query,
    tfidf_top_terms,
)

SF = "/root/testdata/sf0.001"


def test_tfidf_top3_per_doc_and_df_consistency(spark):
    rows = tfidf_top_terms(spark, SF).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 3 for v in per_doc.values())
    # df is a global per-term constant: the same term must carry the
    # same df wherever it appears.
    df_seen = {}
    for r in rows:
        assert df_seen.setdefault(r["term"], r["df"]) == r["df"]
        assert r["tfidf"] > 0


def test_bm25_monotone_and_sorted(spark):
    rows = bm25_score_query(spark, SF).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every returned doc matched at least one query term
    for r in rows:
        assert sum(r[f"tf_{q}"] for q in _QUERY_TERMS) > 0


def test_bm25_topk_plan_avoids_global_window(spark):
    plan = (
        bm25_score_query(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


@pytest.mark.parametrize("q", _QUERY_TERMS)
def test_query_terms_exist_in_corpus(spark, q):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pyspark.sql import functions as F

    n = docs.filter(F.col("text").contains(q)).count()
    assert n > 0
