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
    _R13_FIRST_WITNESS,
    _R13_WINDOW,
    _R14_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r14_rotation,
    stalest_green,
)

# Round-13 rotation (VERDICT round-12 items 1+2, the SECOND
# accelerated drain): the twelve round-13 registrations (the
# r16_staging through r19_staging batches, all flipped to @register
# this round) taking their FIRST driver witness at the head — they
# landed BEFORE the window pin, so never-witnessed beats stale — then
# the 38 stalest greens: the 27 remaining CORRECTNESS_r07 rows
# (VERDICT r12 item 3: the full r7-stale remainder rotates in this
# round), then the 11-row r08 ledger head, stalest witness first,
# ledger-insertion order within a round.
EXPECTED_WINDOW = [
    "bloom_decontaminate_portable", "html_tag_strip_extract",
    "delta_join_view_maintenance",
    "semdedup_scaled_prune", "tv_distance_source_drift",
    "l_diversity_check",
    "unicode_fold_normalize", "deletion_vector_scan",
    "dynamic_partition_pruning_join",
    "sentence_lang_mix_profile", "token_spans_offsets",
    "user_erasure_cascade",
    "tpch_q18_large_volume_customers", "tpch_q19_disjunctive_revenue",
    "text_token_count", "text_quality_score", "text_lang_stats",
    "lang_id_heuristic", "doc_fingerprint", "text_bpe_token_estimate",
    "multimodal_meta", "text_repetition_stats", "text_pii_scan",
    "contamination_ngram_overlap", "stratified_sample_per_lang",
    "token_budget_packing", "dedup_exact", "dedup_ngram_jaccard",
    "similarity_topk_cosine", "embedding_label_centroid_norm",
    "embedding_quantization_error", "event_hourly_windows",
    "event_sliding_windows", "dedup_cluster_assignment",
    "market_pulse_end_to_end", "minhash_lsh_portable",
    "asof_join_latest_anchor", "range_join_price_bands",
    "rolling_avg_7rows",
    "weekly_ohlc", "embedding_int8_quantize", "streaming_ingest_upsert",
    "streaming_windowed_agg", "pivot_lang_counts", "rollup_qty",
    "cube_counts", "top3_per_supplier", "semi_join_big_spenders",
    "set_ops_nations", "except_user_event_pairs",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R13_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R13_FIRST_WITNESS == _R13_WINDOW[:12]
    assert _R13_WINDOW[12:] == stalest_green(38)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R13_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates stalest-first: the full 27-row r7
    # remainder (VERDICT r12 item 3), then 11 r8 rows
    assert all(_DRIVER_GREEN[n] == 7 for n in _R13_WINDOW[12:39])
    assert all(_DRIVER_GREEN[n] == 8 for n in _R13_WINDOW[39:])
    # after this round no green row's witness is older than round 8
    assert all(
        _DRIVER_GREEN[n] >= 8
        for n in _DRIVER_GREEN
        if n not in set(_R13_WINDOW)
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
    # awaiting its first row. A registration missing from _R14_DEFER
    # lands in tier 1 with rank len(_R14_DEFER) — caught here, not
    # silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R13_FIRST_WITNESS) | set(_R14_DEFER)
    )
    assert not set(_R14_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R14_DEFER) & set(_R13_WINDOW)
    # round-13 registry: the 277 round-12 names + the 12 round-13
    # registrations (the r16_staging .. r19_staging accelerated drain)
    assert len(QUERY_REGISTRY) == 289
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R14_DEFER)] == _R14_DEFER


def test_round13_ledger_arithmetic():
    assert len(_R13_WINDOW) == 50
    assert len(set(_R13_WINDOW)) == 50
    # the 38 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R13_WINDOW[12:])
    # the round-12 window landed in the ledger at round 12: 38
    # re-witnesses refreshed + 12 first-witness names entered
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 12) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r14_rotation_defers_then_rotates():
    # the proposed round-14 window: never-witnessed round-13
    # registrations first (empty until the r20/r21/r22_staging batches
    # flip to @register), then the stalest greens assuming this
    # round's window lands green (the r8 ledger remainder continues
    # the rotation).
    rot = r14_rotation()
    assert len(rot) == 50
    assert rot[: len(_R14_DEFER)] == _R14_DEFER
    rest = rot[len(_R14_DEFER):]
    after_r13 = dict(_DRIVER_GREEN)
    after_r13.update(dict.fromkeys(_R13_WINDOW, 13))
    # stalest-first: the remaining r8 rows head the remainder
    rounds = [after_r13[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 8
    assert rest[0] == "lag_lead_weekly"
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R13_WINDOW)
