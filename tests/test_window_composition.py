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
    _R11_FIRST_WITNESS,
    _R11_WINDOW,
    _R12_DEFER,
    QUERY_REGISTRY,
    all_queries,
    r12_rotation,
    stalest_green,
)

# Round-11 rotation (VERDICT round-10 items 1+2, the DOUBLE flip): the
# six round-11 registrations (the r10_staging AND r11_staging batches,
# both flipped to @register this round) taking their FIRST driver
# witness at the head — they landed BEFORE the window pin, so
# never-witnessed beats stale — then the 44 stalest greens: the 9
# remaining CORRECTNESS_r05 rows, then the r06 ledger head, stalest
# witness first, ledger-insertion order within a round (the 7
# SURVEY-§2 chain rows re-witnessed in r6 keep their original r2
# insertion positions, so they precede the r6 first-witness block).
EXPECTED_WINDOW = [
    "exact_substring_trim", "perplexity_stratified_sample",
    "domain_dedup_quality_gate",
    "paragraph_simhash_near_dups", "doremi_excess_loss_reweight",
    "curriculum_pack_easy_first",
    "sql_recursive_cte", "xml_parse_roundtrip", "hll_sketch_mergeability",
    "mad_robust_outliers", "cogroup_signup_purchase_counts",
    "event_sequence_pattern_match", "peak_concurrency_sweep",
    "streaming_session_window", "collation_case_insensitive_group",
    "weekly_rollup", "dim_case_mapping", "left_join_enrich",
    "derived_metrics", "keyed_upsert", "qc_not_null_violations",
    "qc_anti_join_orphans",
    "bpe_learned_merges", "embedding_pca_project",
    "media_decode_features", "media_resize",
    "embedding_kmeans_clusters", "embedding_kmeans_sizes",
    "minhash_lsh_near_dups", "embedding_near_dups", "ann_lsh_topk",
    "ann_ivf_topk", "pq_encode_embeddings", "ann_pq_adc_topk",
    "try_functions_suite", "salted_replicate_join",
    "hashed_linear_quality_score", "mixture_epoch_expansion",
    "watermark_delay_estimate", "prefix_sum_two_phase",
    "simhash_portable", "ann_recall_at_10", "tick_rule_trade_signs",
    "label_propagation_communities", "scd2_point_in_time_join",
    "qc_profile_drift", "sql_pipe_syntax", "pandas_api_groupby",
    "python_datasource_stream", "m4_downsample",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R11_WINDOW == EXPECTED_WINDOW


def test_window_head_is_first_witness_then_stalest_green():
    # the pinned window and the cadence computation stay in lockstep:
    # a ledger edit that would shift the driver's snapshot fails here
    assert _R11_FIRST_WITNESS == _R11_WINDOW[:6]
    assert _R11_WINDOW[6:] == stalest_green(44)
    # the head takes its FIRST driver row this round — no prior witness
    assert not set(_R11_FIRST_WITNESS) & set(_DRIVER_GREEN)
    # the re-witness tail rotates stalest-first: 9 r5 rows then 35 r6
    assert all(_DRIVER_GREEN[n] == 5 for n in _R11_WINDOW[6:15])
    assert all(_DRIVER_GREEN[n] == 6 for n in _R11_WINDOW[15:])


def test_window_has_full_oracles():
    # steady state preserves the round-6 terminal property: every
    # window row is full value-hash checked, no rows-only slots.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_ledger_is_closed_and_additions_defer():
    # Steady-state invariant: every registered query is driver-green,
    # in this round's first-witness head, or a deferred registration
    # awaiting its first row. A registration missing from _R12_DEFER
    # lands in tier 1 with rank len(_R12_DEFER) — caught here, not
    # silently shuffled into the window.
    assert set(QUERY_REGISTRY) == (
        set(_DRIVER_GREEN) | set(_R11_FIRST_WITNESS) | set(_R12_DEFER)
    )
    assert not set(_R12_DEFER) & set(_DRIVER_GREEN)
    assert not set(_R12_DEFER) & set(_R11_WINDOW)
    # round-11 registry: the 259 round-10 names + the 6 round-11
    # registrations (the r10_staging + r11_staging double flip)
    assert len(QUERY_REGISTRY) == 265
    # tier-1 names (positions 50..) are exactly the deferral list, in
    # order — new operators never displace a verified window slot
    assert list(all_queries())[50:50 + len(_R12_DEFER)] == _R12_DEFER


def test_round11_ledger_arithmetic():
    assert len(_R11_WINDOW) == 50
    assert len(set(_R11_WINDOW)) == 50
    # the 44 re-witnesses all have existing green rows
    assert all(n in _DRIVER_GREEN for n in _R11_WINDOW[6:])
    # the round-10 window landed in the ledger at round 10: 47
    # re-witnesses refreshed + 3 first-witness names entered
    assert sum(1 for v in _DRIVER_GREEN.values() if v == 10) == 50


def test_rows_only_floor():
    # round-6 terminal state, preserved: zero rows-only queries. A new
    # rows-only registration must be a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r12_rotation_defers_then_rotates():
    # the proposed round-12 window: never-witnessed round-11
    # registrations first (empty until the r12_staging batch flips to
    # @register), then the stalest greens assuming this round's window
    # lands green (the r6 ledger remainder + the head of r7 continue
    # the rotation).
    rot = r12_rotation()
    assert len(rot) == 50
    assert rot[: len(_R12_DEFER)] == _R12_DEFER
    rest = rot[len(_R12_DEFER):]
    after_r11 = dict(_DRIVER_GREEN)
    after_r11.update(dict.fromkeys(_R11_WINDOW, 11))
    # stalest-first: the remaining r6 rows head the remainder
    rounds = [after_r11[n] for n in rest]
    assert rounds == sorted(rounds)
    assert rounds[0] == 6
    assert rest[0] == "calendar_interpolate_linear"
    # nothing in the proposal repeats this round's window
    assert not set(rot) & set(_R11_WINDOW)
