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
    _R7_WINDOW,
    _R8_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r8_rotation,
    stalest_green,
)

# Round-7 rotation (VERDICT round-6 item 1 — the first steady-state
# round): CORRECTNESS_r06 landed 50/50 green, closing the ledger at
# 241/241 driver-witnessed, so from here each round re-witnesses the
# 50 STALEST rows. That is the 42 r2 survivors not re-witnessed in
# round 6 (the SURVEY-§2 stg_alphavantage / get_stock.py:84-105 chain
# at the head), then the first 8 r3 rows, in original window order —
# exactly what round 6's pinned r7_rotation() computed.
EXPECTED_WINDOW = [
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
    "tpch_q8_market_share", "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue", "text_token_count",
    "text_quality_score", "text_lang_stats", "lang_id_heuristic",
    "doc_fingerprint", "text_bpe_token_estimate", "multimodal_meta",
    "text_repetition_stats", "text_pii_scan",
    "contamination_ngram_overlap", "stratified_sample_per_lang",
    "token_budget_packing", "dedup_exact", "dedup_ngram_jaccard",
    "similarity_topk_cosine", "embedding_label_centroid_norm",
    "embedding_quantization_error",
    "event_hourly_windows", "event_sliding_windows",
    "dedup_cluster_assignment", "market_pulse_end_to_end",
    "minhash_lsh_portable", "asof_join_latest_anchor",
    "range_join_price_bands", "rolling_avg_7rows",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R7_WINDOW == EXPECTED_WINDOW


def test_window_is_the_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R7_WINDOW == stalest_green()
    # the re-witness cadence actually rotates: nothing in this window
    # was witnessed later than round 3
    assert all(_DRIVER_GREEN[n] <= 3 for n in _R7_WINDOW)


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is either
    # driver-green or a deferred round-7 registration awaiting its
    # first row. A registration missing from _R8_DEFER lands in
    # tier 1 with rank len(_R8_DEFER) — caught here, not silently
    # shuffled into the window.
    assert set(QUERY_REGISTRY) == set(_DRIVER_GREEN) | set(_R8_DEFER)
    assert not set(_R8_DEFER) & set(_DRIVER_GREEN)
    # 241 green + 6 round-6-staged + 3 round-7 additions
    assert len(QUERY_REGISTRY) == 250
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R8_DEFER)] == _R8_DEFER


def test_round7_ledger_arithmetic():
    assert len(_R7_WINDOW) == 50
    assert len(set(_R7_WINDOW)) == 50
    # every window row is a re-witness of an existing green row
    assert all(n in _DRIVER_GREEN for n in _R7_WINDOW)
    r2_left = [n for n in _R7_WINDOW if _DRIVER_GREEN[n] == 2]
    assert len(r2_left) == 42
    assert len([n for n in _R7_WINDOW if _DRIVER_GREEN[n] == 3]) == 8


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r8_rotation_defers_then_rotates():
    # the proposed round-8 window: never-witnessed round-7
    # registrations first, then the stalest greens assuming this
    # round's window lands green (r3 survivors continue the rotation).
    rot = r8_rotation()
    assert len(rot) == 50
    assert rot[: len(_R8_DEFER)] == _R8_DEFER
    rest = rot[len(_R8_DEFER):]
    after_r7 = dict(_DRIVER_GREEN)
    after_r7.update(dict.fromkeys(_R7_WINDOW, 7))
    # stalest-first: the 41 remaining r3 rows, then the head of r4
    rounds = [after_r7[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 3 and rounds.count(3) == 41
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R7_WINDOW)
