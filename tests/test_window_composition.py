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
    _R12_FIRST_WITNESS,
    _R12_WINDOW,
    _R13_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r13_rotation,
    stalest_green,
)

# Round-12 rotation (VERDICT round-11 items 1+7, the ACCELERATED
# drain): the twelve round-12 registrations (the r12_staging through
# r15_staging batches, all flipped to @register this round) taking
# their FIRST driver witness at the head — they landed BEFORE the
# window pin, so never-witnessed beats stale — then the 38 stalest
# greens: the 15 remaining CORRECTNESS_r06 rows, then the r07 ledger
# head, stalest witness first, ledger-insertion order within a round
# (the SURVEY-§2 chain rows re-witnessed in r7 keep their original r2
# insertion positions, so they precede the TPC-H block).
EXPECTED_WINDOW = [
    "corpus_yield_funnel", "c4_line_filters",
    "hot_ngram_blocklist_coverage",
    "eval_decontaminate_semantic", "rendezvous_shard_assignment",
    "lsh_recall_curve",
    "dsir_importance_resample", "containment_excerpt_dups",
    "quality_calibration_ece",
    "softdedup_commonness_reweight", "url_canonicalize_dedup",
    "domain_suffix_optout_filter",
    "calendar_interpolate_linear", "ab_test_proportions",
    "interval_merge_maximal", "ndcg_at_k", "vocab_unk_rate",
    "qc_join_multiplicity", "graph_bfs_k_hop",
    "streaming_outer_join_eviction", "linear_regression_gd",
    "skyline_pareto_parts", "quota_largest_remainder",
    "attribution_position_credit", "heavy_hitters_mg_verified",
    "vocab_top_p_coverage", "rrf_hybrid_fusion",
    "json_path_extract", "explode_words", "distinct_keys",
    "dedup_keep_latest", "incremental_merge", "qc_unique_violations",
    "map_explode_props", "variant_path_extract",
    "qc_accepted_values_violations", "argmin_unit_price_supplier",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q6_forecast_revenue",
    "tpch_q12_shipmode_priority", "tpch_q10_returned_items",
    "tpch_q14_promo_revenue", "tpch_q5_local_supplier",
    "tpch_q13_customer_distribution", "tpch_q16_supplier_part_counts",
    "tpch_q22_dormant_rich_customers", "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R12_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R12_FIRST_WITNESS == _R12_WINDOW[:12]
    assert _R12_WINDOW[12:] == stalest_green(38)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R12_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates stalest-first: 15 r6 rows then 23 r7
    assert all(_DRIVER_GREEN[n] == 6 for n in _R12_WINDOW[12:27])
    assert all(_DRIVER_GREEN[n] == 7 for n in _R12_WINDOW[27:])


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is driver-green,
    # in this round's first-witness head, or a deferred registration
    # awaiting its first row. A registration missing from _R13_DEFER
    # lands in tier 1 with rank len(_R13_DEFER) — caught here, not
    # silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R12_FIRST_WITNESS) | set(_R13_DEFER)
    )
    assert not set(_R13_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R13_DEFER) & set(_R12_WINDOW)
    # round-12 registry: the 265 round-11 names + the 12 round-12
    # registrations (the r12_staging .. r15_staging accelerated drain)
    assert len(QUERY_REGISTRY) == 277
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R13_DEFER)] == _R13_DEFER


def test_round12_ledger_arithmetic():
    assert len(_R12_WINDOW) == 50
    assert len(set(_R12_WINDOW)) == 50
    # the 38 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R12_WINDOW[12:])
    # the round-11 window landed in the ledger at round 11: 44
    # re-witnesses refreshed + 6 first-witness names entered
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 11) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r13_rotation_defers_then_rotates():
    # the proposed round-13 window: never-witnessed round-12
    # registrations first (empty until the r16/r17_staging batches
    # flip to @register), then the stalest greens assuming this
    # round's window lands green (the r7 ledger remainder + the head
    # of r8 continue the rotation).
    rot = r13_rotation()
    assert len(rot) == 50
    assert rot[: len(_R13_DEFER)] == _R13_DEFER
    rest = rot[len(_R13_DEFER):]
    after_r12 = dict(_DRIVER_GREEN)
    after_r12.update(dict.fromkeys(_R12_WINDOW, 12))
    # stalest-first: the remaining r7 rows head the remainder
    rounds = [after_r12[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 7
    assert rest[0] == "tpch_q18_large_volume_customers"
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R12_WINDOW)
