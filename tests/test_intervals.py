"""Maximal-interval merge edge semantics on handcrafted spans (the
registered query `interval_merge_maximal` carries the DuckDB oracle at
scale)."""

from market_pulse_data_pipeline_spark.operators.intervals import (
    merge_maximal_intervals,
)


def _merge(spark, rows):
    df = spark.createDataFrame(rows, "k bigint, s bigint, e bigint, id bigint")
    return {
        (r.k, r.island): (r.start, r.end, r.n_spans)
        for r in merge_maximal_intervals(df, "k", "s", "e", "id").collect()
    }


def test_contained_interval_does_not_split(spark):
    # [0,100] contains [10,20] and [30,40]; a prev-END-only comparison
    # would start a new island at s=30 (30 > 20) — the running MAX of
    # ends must keep all three in ONE island.
    out = _merge(spark, [(1, 0, 100, 1), (1, 10, 20, 2), (1, 30, 40, 3)])
    assert out == {(1, 1): (0, 100, 3)}


def test_touching_boundary_merges(spark):
    # closed intervals: start == running max end → same island
    out = _merge(spark, [(1, 0, 10, 1), (1, 10, 20, 2)])
    assert out == {(1, 1): (0, 20, 2)}


def test_disjoint_spans_split(spark):
    out = _merge(spark, [(1, 0, 10, 1), (1, 11, 20, 2), (2, 5, 6, 3)])
    assert out == {
        (1, 1): (0, 10, 1),
        (1, 2): (11, 20, 1),
        (2, 1): (5, 6, 1),
    }


def test_chain_of_overlaps_is_transitive(spark):
    # a–b overlap, b–c overlap, a–c do not: still one island
    out = _merge(spark, [(1, 0, 10, 1), (1, 5, 15, 2), (1, 12, 30, 3)])
    assert out == {(1, 1): (0, 30, 3)}
