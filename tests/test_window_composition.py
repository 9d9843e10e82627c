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
    _R15_FIRST_WITNESS,
    _R15_WINDOW,
    _R16_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r16_rotation,
    stalest_green,
)

# Round-15 rotation (VERDICT round-14 items 2+3): the three round-15
# registrations (the r23_staging batch, flipped to @register on its
# named flip round — registry 298 → 301) taking their FIRST driver
# witness at the head — they landed BEFORE the window pin, so
# never-witnessed beats stale — then the 47 stalest greens: the
# 47-row head of the 48-row CORRECTNESS_r09 ledger remainder, stalest
# witness first, ledger-insertion order within a round (after this
# round exactly one r9 row, boilerplate_sentence_removal, remains for
# round 16).
EXPECTED_WINDOW = [
    "t_closeness_check", "auc_quality_classifier",
    "unimax_epoch_cap_allocation",
    "hourly_activity_bitmask", "source_mixture_weights",
    "table_fingerprint_orders", "cdc_version_diff", "cdc_apply_changes",
    "streaming_cdc_apply", "kmv_distinct_partkeys", "countmin_user_freq",
    "weighted_sample_per_lang", "kmv_join_cardinality_estimate",
    "ewma_value_10tap", "rolling_drawdown", "range_frame_7day_revenue",
    "vwap_per_part", "bollinger_bands_20d", "twap_value_per_user",
    "rsi_14_daily_revenue", "max_drawdown_summary",
    "ohlc_multi_granularity", "autocorr_lag1_daily_revenue",
    "cusum_changepoint_by_supplier", "beta_vs_market_by_supplier",
    "quantile_normalize_value", "kwic_concordance",
    "dedup_survivor_policy", "dedup_prefix_filter_join",
    "matryoshka_truncation_quality", "contrastive_negative_sampling",
    "event_type_transition_matrix", "funnel_multi_step",
    "dow_hour_seasonality", "cohort_ltv_curve", "debounce_dedup_events",
    "rank_functions_suite", "grouping_sets_flags",
    "profile_columns_lineitem", "skew_heavy_hitters",
    "streaming_dedup_watermark", "streaming_interval_join_attribution",
    "streaming_stateful_user_stats", "streaming_static_enrich",
    "vocab_top_tokens",
    "ccnet_perplexity_buckets", "mixture_temperature_weights",
    "winnowing_fingerprint_pairs", "eval_decontaminate_exact_ngrams",
    "winnowing_cluster_dedup",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R15_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R15_FIRST_WITNESS == _R15_WINDOW[:3]
    assert _R15_WINDOW[3:] == stalest_green(47)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R15_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates stalest-first: the 47-row head of
    # the 48-row r9 ledger remainder (VERDICT r14 item 3)
    assert all(_DRIVER_GREEN[n] == 9 for n in _R15_WINDOW[3:])
    # after this round exactly ONE green row's witness is older than
    # round 10 — boilerplate_sentence_removal, absorbed by round 16
    assert [
        n
        for n in _DRIVER_GREEN
        if _DRIVER_GREEN[n] == 9 and n not in set(_R15_WINDOW)
    ] == ["boilerplate_sentence_removal"]
    assert all(
        _DRIVER_GREEN[n] >= 9
        for n in _DRIVER_GREEN
        if n not in set(_R15_WINDOW)
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
    # awaiting its first row. A registration missing from _R16_DEFER
    # lands in tier 1 with rank len(_R16_DEFER) — caught here, not
    # silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R15_FIRST_WITNESS) | set(_R16_DEFER)
    )
    assert not set(_R16_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R16_DEFER) & set(_R15_WINDOW)
    # round-15 registry: the 298 round-14 names + the 3 round-15
    # registrations (the r23_staging named-round flip)
    assert len(QUERY_REGISTRY) == 301
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R16_DEFER)] == _R16_DEFER


def test_round15_ledger_arithmetic():
    assert len(_R15_WINDOW) == 50
    assert len(set(_R15_WINDOW)) == 50
    # the 47 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R15_WINDOW[3:])
    # the round-14 window landed in the ledger at round 14: 41
    # re-witnesses refreshed + 9 first-witness names entered
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 14) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r16_rotation_defers_then_rotates():
    # the proposed round-16 window: never-witnessed round-15
    # registrations first (empty until the r24_staging batch — and the
    # round-15-staged r29 streaming-recovery witness — flips to
    # @register on its named round), then the stalest greens assuming
    # this round's window lands green (the last r9 row, then the r10
    # ledger head, continues the rotation).
    rot = r16_rotation()
    assert len(rot) == 50
    assert rot[: len(_R16_DEFER)] == _R16_DEFER
    rest = rot[len(_R16_DEFER):]
    after_r15 = dict(_DRIVER_GREEN)
    after_r15.update(dict.fromkeys(_R15_WINDOW, 15))
    # stalest-first: the final r9 row heads the remainder
    rounds = [after_r15[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 9
    assert rest[0] == "boilerplate_sentence_removal"
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R15_WINDOW)
