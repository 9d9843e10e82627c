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
    _R10_FIRST_WITNESS,
    _R10_WINDOW,
    _R11_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r11_rotation,
    stalest_green,
)

# Round-10 rotation (VERDICT round-9 item 1): the three round-10
# registrations (the r9_staging batch, flipped to @register this
# round) taking their FIRST driver witness at the head — they landed
# BEFORE the window pin, so never-witnessed beats stale — then the 47
# stalest greens: the 6 remaining CORRECTNESS_r04 rows, then the r05
# ledger head, stalest witness first, original window order within a
# round.
EXPECTED_WINDOW = [
    "gopher_repetition_filters", "eval_decontaminate_fuzzy_minhash",
    "lang_id_rank_profile",
    "cross_corpus_dedup_exact", "doc_chunking",
    "mixture_rebalanced_sample", "bernoulli_sample_hash",
    "corpus_pipeline_end_to_end", "corpus_quality_filter",
    "text_pii_redact", "char_class_profile", "sentence_dedup_profile",
    "scd2_user_event_type_history", "dedup_fuzzy_blocked",
    "k_anonymity_check", "benford_first_digit_audit",
    "chi2_independence_lang_source", "format_roundtrip_orc",
    "format_roundtrip_csv", "format_roundtrip_jsonl",
    "partitioned_write_readback", "schema_evolution_read",
    "pagerank_user_event_graph", "centroid_classifier_confusion",
    "embedding_mean_pool_by_label", "sql_text_shared_dialect",
    "sql_registered_udf", "sql_lateral_top2_orders",
    "udtf_split_sentences", "incremental_agg_maintenance",
    "calendar_gapfill_ffill", "pointer_swap_time_travel",
    "join_strategy_independence", "tfidf_top_terms", "bm25_score_query",
    "zorder_locality_boxes", "bigram_fluency_score", "media_audio_windows",
    "array_setops_user_events", "higher_order_array_suite",
    "sql_scalar_udf_params", "sql_table_function_orders",
    "salted_skew_aggregate", "bucketed_join_colocated",
    "bloom_filter_prejoin", "compaction_roundtrip", "basket_lift_pairs",
    "triangle_count_parts", "split_leakage_safe", "unpivot_nation_metrics",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R10_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R10_FIRST_WITNESS == _R10_WINDOW[:3]
    assert _R10_WINDOW[3:] == stalest_green(47)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R10_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates stalest-first: 6 r4 rows then 41 r5
    assert all(_DRIVER_GREEN[n] == 4 for n in _R10_WINDOW[3:9])
    assert all(_DRIVER_GREEN[n] == 5 for n in _R10_WINDOW[9:])


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is driver-green,
    # in this round's first-witness head, or a deferred registration
    # awaiting its first row. A registration missing from _R11_DEFER
    # lands in tier 1 with rank len(_R11_DEFER) — caught here, not
    # silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R10_FIRST_WITNESS) | set(_R11_DEFER)
    )
    assert not set(_R11_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R11_DEFER) & set(_R10_WINDOW)
    # round-10 registry: the 256 round-8 names + the 3 round-10
    # registrations (the r9_staging batch flip)
    assert len(QUERY_REGISTRY) == 259
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R11_DEFER)] == _R11_DEFER


def test_round10_ledger_arithmetic():
    assert len(_R10_WINDOW) == 50
    assert len(set(_R10_WINDOW)) == 50
    # the 47 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R10_WINDOW[3:])
    # the round-9 window landed in the ledger at round 9: 44
    # re-witnesses refreshed + 6 first-witness names entered
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 9) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r11_rotation_defers_then_rotates():
    # the proposed round-11 window: never-witnessed round-10
    # registrations first (empty until the r10_staging batch flips to
    # @register), then the stalest greens assuming this round's window
    # lands green (the 9 remaining r5 rows + the head of r6 continue
    # the rotation).
    rot = r11_rotation()
    assert len(rot) == 50
    assert rot[: len(_R11_DEFER)] == _R11_DEFER
    rest = rot[len(_R11_DEFER):]
    after_r10 = dict(_DRIVER_GREEN)
    after_r10.update(dict.fromkeys(_R10_WINDOW, 10))
    # stalest-first: the remaining r5 rows head the remainder
    rounds = [after_r10[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 5
    assert rest[0] == "sql_recursive_cte"
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R10_WINDOW)
