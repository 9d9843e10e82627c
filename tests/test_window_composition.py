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
    _R14_FIRST_WITNESS,
    _R14_WINDOW,
    _R15_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r15_rotation,
    stalest_green,
)

# Round-14 rotation (VERDICT round-13 items 1+3, the FULL drain): the
# nine round-14 registrations (the r20_staging through r22_staging
# batches, all flipped to @register this round — staged backlog 0,
# two rounds ahead of the original drain-by-round-16 schedule) taking
# their FIRST driver witness at the head — they landed BEFORE the
# window pin, so never-witnessed beats stale — then the 41 stalest
# greens: the 39 remaining CORRECTNESS_r08 rows (VERDICT r13 item 3:
# the full r8-stale remainder rotates in this round), then the 2-row
# r09 ledger head, stalest witness first, ledger-insertion order
# within a round.
EXPECTED_WINDOW = [
    "trigram_substring_index", "equi_depth_histogram_stats",
    "incremental_sessionization",
    "decayed_event_frequency", "json_schema_infer",
    "categorical_dictionary_encode",
    "grid_radius_join", "seasonal_naive_backtest",
    "gazetteer_phrase_match",
    "lag_lead_weekly", "regr_slope_by_event_type",
    "value_histogram_by_event_type", "corr_quantity_price_by_flag",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue", "tpch_q20_excess_stock_suppliers",
    "tpch_q21_waiting_suppliers", "exact_substring_spans",
    "label_centroid_pairwise_cosine", "session_window_native",
    "retention_cohorts", "event_funnel_signup_purchase",
    "media_frame_sample", "numeric_functions_suite", "zscore_outliers",
    "bool_aggregates", "variance_by_event_type", "regex_extract_props",
    "percentiles_by_event_type", "approx_distinct_parts",
    "collect_sorted_event_types", "string_functions_suite",
    "date_functions_suite", "approx_percentiles_events",
    "full_outer_reconciliation", "array_functions_suite",
    "semdedup_prune", "ngram_novelty_profile", "domain_frequency_cap",
    "kcenter_diversity_sample", "colbert_maxsim_topk",
    "incremental_near_dup_lsh", "bpe_encode_corpus",
    "quality_threshold_sweep", "bpe_fertility_by_lang",
    "sessionization", "running_distinct_event_types",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R14_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R14_FIRST_WITNESS == _R14_WINDOW[:9]
    assert _R14_WINDOW[9:] == stalest_green(41)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R14_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates stalest-first: the full 39-row r8
    # remainder (VERDICT r13 item 3), then 2 r9 rows
    assert all(_DRIVER_GREEN[n] == 8 for n in _R14_WINDOW[9:48])
    assert all(_DRIVER_GREEN[n] == 9 for n in _R14_WINDOW[48:])
    # after this round no green row's witness is older than round 9
    assert all(
        _DRIVER_GREEN[n] >= 9
        for n in _DRIVER_GREEN
        if n not in set(_R14_WINDOW)
    )


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is driver-green,
    # in this round's first-witness head, or a deferred registration
    # awaiting its first row. A registration missing from _R15_DEFER
    # lands in tier 1 with rank len(_R15_DEFER) — caught here, not
    # silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R14_FIRST_WITNESS) | set(_R15_DEFER)
    )
    assert not set(_R15_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R15_DEFER) & set(_R14_WINDOW)
    # round-14 registry: the 289 round-13 names + the 9 round-14
    # registrations (the r20_staging .. r22_staging full drain)
    assert len(QUERY_REGISTRY) == 298
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R15_DEFER)] == _R15_DEFER


def test_round14_ledger_arithmetic():
    assert len(_R14_WINDOW) == 50
    assert len(set(_R14_WINDOW)) == 50
    # the 41 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R14_WINDOW[9:])
    # the round-13 window landed in the ledger at round 13: 38
    # re-witnesses refreshed + 12 first-witness names entered
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 13) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r15_rotation_defers_then_rotates():
    # the proposed round-15 window: never-witnessed round-14
    # registrations first (empty until the r23_staging batch flips to
    # @register on its named round), then the stalest greens assuming
    # this round's window lands green (the r9 ledger remainder
    # continues the rotation).
    rot = r15_rotation()
    assert len(rot) == 50
    assert rot[: len(_R15_DEFER)] == _R15_DEFER
    rest = rot[len(_R15_DEFER):]
    after_r14 = dict(_DRIVER_GREEN)
    after_r14.update(dict.fromkeys(_R14_WINDOW, 14))
    # stalest-first: the remaining r9 rows head the remainder
    rounds = [after_r14[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 9
    assert rest[0] == "hourly_activity_bitmask"
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R14_WINDOW)
