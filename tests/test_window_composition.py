"""The driver's CORRECTNESS harness snapshots exactly the FIRST 50
entries of queries() in iteration order. This pin makes the shipped
window composition an explicit, test-guarded artifact: registering a
new query in an early-imported module must NOT silently displace a
verified entry (tier-1 ordering follows module import order, so it
otherwise would — caught live in round 3 and guarded here).

When the window is INTENTIONALLY rotated (a new round moving fresh
queries in), update EXPECTED_WINDOW alongside queries/__init__.py in
the same commit.
"""

from market_pulse_data_pipeline_spark.queries import (
    _DRIVER_GREEN,
    _R8_FIRST_WITNESS,
    _R8_WINDOW,
    _R9_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r9_rotation,
    stalest_green,
)

# Round-8 rotation (VERDICT round-7 item 1): byte-for-byte what
# round 7's pinned r8_rotation() computed — the nine round-7
# registrations taking their FIRST driver witness (the LLM-pipeline
# surface), then the 41 remaining CORRECTNESS_r03 rows, stalest
# witness first, original window order within the round.
EXPECTED_WINDOW = [
    "semdedup_prune", "ngram_novelty_profile", "domain_frequency_cap",
    "kcenter_diversity_sample", "colbert_maxsim_topk",
    "incremental_near_dup_lsh", "bpe_encode_corpus",
    "quality_threshold_sweep", "bpe_fertility_by_lang",
    "weekly_ohlc", "embedding_int8_quantize", "streaming_ingest_upsert",
    "streaming_windowed_agg", "pivot_lang_counts", "rollup_qty",
    "cube_counts", "top3_per_supplier", "semi_join_big_spenders",
    "set_ops_nations", "except_user_event_pairs", "lag_lead_weekly",
    "regr_slope_by_event_type", "value_histogram_by_event_type",
    "corr_quantity_price_by_flag", "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit", "tpch_q11_important_stock",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_stock_suppliers", "tpch_q21_waiting_suppliers",
    "exact_substring_spans", "label_centroid_pairwise_cosine",
    "session_window_native", "retention_cohorts",
    "event_funnel_signup_purchase", "media_frame_sample",
    "numeric_functions_suite", "zscore_outliers", "bool_aggregates",
    "variance_by_event_type", "regex_extract_props",
    "percentiles_by_event_type", "approx_distinct_parts",
    "collect_sorted_event_types", "string_functions_suite",
    "date_functions_suite", "approx_percentiles_events",
    "full_outer_reconciliation", "array_functions_suite",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R8_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R8_FIRST_WITNESS == _R8_WINDOW[:9]
    assert _R8_WINDOW[9:] == stalest_green(41)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R8_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates: all of it was last witnessed round 3
    assert all(_DRIVER_GREEN[n] == 3 for n in _R8_WINDOW[9:])


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is driver-green,
    # in this round's first-witness head, or a deferred round-8
    # registration awaiting its first row. A registration missing from
    # _R9_DEFER lands in tier 1 with rank len(_R9_DEFER) — caught
    # here, not silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R8_FIRST_WITNESS) | set(_R9_DEFER)
    )
    assert not set(_R9_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R9_DEFER) & set(_R8_WINDOW)
    # 250 round-7 registry + 3 round-8 registrations of the staged
    # batch + 3 round-8 additions
    assert len(QUERY_REGISTRY) == 256
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R9_DEFER)] == _R9_DEFER


def test_round8_ledger_arithmetic():
    assert len(_R8_WINDOW) == 50
    assert len(set(_R8_WINDOW)) == 50
    # the 41 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R8_WINDOW[9:])
    # the round-7 re-witness window landed in the ledger at round 7
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 7) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r9_rotation_defers_then_rotates():
    # the proposed round-9 window: never-witnessed round-8
    # registrations first, then the stalest greens assuming this
    # round's window lands green (r4 rows continue the rotation).
    rot = r9_rotation()
    assert len(rot) == 50
    assert rot[: len(_R9_DEFER)] == _R9_DEFER
    rest = rot[len(_R9_DEFER):]
    after_r8 = dict(_DRIVER_GREEN)
    after_r8.update(dict.fromkeys(_R8_WINDOW, 8))
    # stalest-first: the r4 rows head the remainder
    rounds = [after_r8[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 4
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R8_WINDOW)
