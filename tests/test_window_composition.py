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
    _R15_WINDOW,
    _R17_DEFER,
    _R17_TOUCHED,
    _R17_WINDOW,
    QUERY_REGISTRY,
    all_queries,
    r18_rotation,
    stalest_green,
)

# Round-17 rotation (VERDICT r16 "Next round" item 3): the window
# LEADS with the benched query paths rounds 16-17 rewrote while the
# rotation was frozen (plus one kmeans_snapped_fit consumer for the
# fused-fit family), then resumes the steady-state stalest-first
# cadence — the last r9 row (boilerplate_sentence_removal), then the
# r10 ledger head, skipping names already in the touched head.
EXPECTED_WINDOW = [
    # touched head — every r16/r17 rewritten benched path
    "semdedup_prune", "semdedup_scaled_prune", "basket_lift_pairs",
    "weekly_rollup", "rolling_avg_7rows", "weekly_ohlc",
    "tpch_q1_pricing_summary", "paragraph_simhash_near_dups",
    "incremental_sessionization", "bloom_decontaminate_portable",
    "exact_substring_trim", "incremental_near_dup_lsh",
    "eval_decontaminate_semantic", "containment_excerpt_dups",
    "minhash_lsh_near_dups", "eval_decontaminate_fuzzy_minhash",
    "gopher_repetition_filters", "embedding_kmeans_clusters",
    "tpch_q9_product_profit", "kmv_distinct_partkeys",
    "gazetteer_phrase_match",
    # stalest-green tail
    "boilerplate_sentence_removal",
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
    "calendar_gapfill_ffill",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R17_WINDOW == EXPECTED_WINDOW


def test_window_head_is_touched_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R17_WINDOW[: len(_R17_TOUCHED)] == _R17_TOUCHED
    # every touched-head name already has a green row (these are
    # RE-witnesses of rewritten paths, not first witnesses)
    assert all(n in _DRIVER_GREEN for n in _R17_TOUCHED)
    # the tail is exactly the stalest greens minus the touched head
    tail_want = [
        n for n in stalest_green(len(QUERY_REGISTRY))
        if n not in set(_R17_TOUCHED)
    ][: 50 - len(_R17_TOUCHED)]
    assert _R17_WINDOW[len(_R17_TOUCHED):] == tail_want
    # the tail resumes at the last r9 row, then the r10 ledger head
    assert _R17_WINDOW[len(_R17_TOUCHED)] == "boilerplate_sentence_removal"
    assert all(
        _DRIVER_GREEN[n] in (9, 10) for n in _R17_WINDOW[len(_R17_TOUCHED):]
    )


def test_r16_ledger_block():
    # round 16 re-witnessed the frozen round-15 window verbatim
    # (CORRECTNESS_r16 50/50 green): every one of those names is now a
    # round-16 row, and nothing else is
    assert all(_DRIVER_GREEN[n] == 16 for n in _R15_WINDOW)
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 16) == 50


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is driver-green
    # or a deferred registration awaiting its first row. A
    # registration missing from _R17_DEFER lands in tier 1 with rank
    # len(_R17_DEFER) — caught here, not silently shuffled into the
    # window.
    assert set(QUERY_REGISTRY) == set(_DRIVER_GREEN) | set(_R17_DEFER)
    assert not set(_R17_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R17_DEFER) & set(_R17_WINDOW)
    # rounds 16-17 are optimization rounds: registry frozen at 301
    assert len(QUERY_REGISTRY) == 301
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R17_DEFER)] == _R17_DEFER


def test_round17_ledger_arithmetic():
    assert len(_R17_WINDOW) == 50
    assert len(set(_R17_WINDOW)) == 50
    assert all(n in _DRIVER_GREEN for n in _R17_WINDOW)
    assert all(n in QUERY_REGISTRY for n in _R17_WINDOW)


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r18_rotation_defers_then_rotates():
    # the proposed round-18 window: never-witnessed registrations
    # first (empty until the deferred r24/r25/r29/r30 staging batches
    # flip to @register), then the stalest greens assuming this
    # round's window lands green.
    rot = r18_rotation()
    assert len(rot) == 50
    assert rot[: len(_R17_DEFER)] == _R17_DEFER
    rest = rot[len(_R17_DEFER):]
    after_r17 = dict(_DRIVER_GREEN)
    after_r17.update(dict.fromkeys(_R17_WINDOW, 17))
    # stalest-first
    rounds = [after_r17[n] for n in rest]
    assert rounds == sorted(rounds)
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R17_WINDOW)
