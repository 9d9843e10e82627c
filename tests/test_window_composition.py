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
    _R6_WINDOW,
    QUERY_REGISTRY,
    all_queries,
    r7_rotation,
)

# Round-6 rotation (the ledger-zeroing round): the 43 still-unwitnessed
# oracled queries from the round-5 deferral list in original order +
# the SURVEY-§2 reference-chain re-witness (weekly_rollup,
# dim_case_mapping, derived_metrics, keyed_upsert,
# qc_not_null_violations, qc_anti_join_orphans) + left_join_enrich
# (§2 J1, the round-5 perf-weak row, taking the slot freed by
# retiring rows-only simhash_near_dups). After this window lands
# green, every registered query has a driver-witnessed row.
EXPECTED_WINDOW = [
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
    "calendar_interpolate_linear", "ab_test_proportions",
    "interval_merge_maximal", "ndcg_at_k", "vocab_unk_rate",
    "qc_join_multiplicity", "graph_bfs_k_hop",
    "streaming_outer_join_eviction", "linear_regression_gd",
    "skyline_pareto_parts", "quota_largest_remainder",
    "attribution_position_credit", "heavy_hitters_mg_verified",
    "vocab_top_p_coverage", "rrf_hybrid_fusion",
    "weekly_rollup", "dim_case_mapping", "derived_metrics",
    "keyed_upsert", "qc_not_null_violations", "qc_anti_join_orphans",
    "left_join_enrich",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW
    assert _R6_WINDOW == EXPECTED_WINDOW


def test_window_has_full_oracles():
    # the ledger-zeroing window wastes no slot on a rows-only check:
    # every one of the 50 rows is full value-hash checked.
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == []


def test_registry_frozen_for_round6():
    # VERDICT round-5 item 2: zero additions this round — the window
    # math (43 backlog + 7 re-witness = 50) has no slack. Every
    # registered query is either in the shipped window or
    # driver-green; a new registration lands in tier 1 and breaks
    # this loudly instead of silently displacing a backlog entry.
    assert set(QUERY_REGISTRY) == set(_R6_WINDOW) | set(_DRIVER_GREEN)
    assert len(QUERY_REGISTRY) == 241


def test_round6_ledger_arithmetic():
    assert len(_R6_WINDOW) == 50
    # the seven re-witness rows are r2-green §2 reference-chain
    # queries; the other 43 have never had a driver row
    rewitness = [n for n in _R6_WINDOW if n in _DRIVER_GREEN]
    assert rewitness == [
        "weekly_rollup", "dim_case_mapping", "derived_metrics",
        "keyed_upsert", "qc_not_null_violations", "qc_anti_join_orphans",
        "left_join_enrich",
    ]
    assert all(_DRIVER_GREEN[n] == 2 for n in rewitness)


def test_rows_only_floor():
    # round-6 terminal state: zero rows-only queries. simhash_near_dups
    # (engine-specific xxhash64 signatures — a cross-engine oracle
    # cannot exist) was retired in favor of its hash-checked md5 twin
    # simhash_portable; the xxhash path keeps its pytest coverage in
    # tests/test_scale_paths.py. A new rows-only registration must be
    # a conscious decision, not drift.
    rows_only = {n for n, q in QUERY_REGISTRY.items() if q.oracle is None}
    assert rows_only == set()


def test_r7_rotation_is_stalest_first():
    # VERDICT round-5 item 7: steady-state cadence. The proposed
    # round-7 window is the 50 stalest witnesses assuming round 6
    # lands green: the 42 r2 rows not re-witnessed in round 6, then
    # the first 8 r3 rows in original window order.
    rot = r7_rotation()
    assert len(rot) == 50
    after_r6 = dict(_DRIVER_GREEN)
    after_r6.update(dict.fromkeys(_R6_WINDOW, 6))
    r2_left = [n for n, r in _DRIVER_GREEN.items() if r == 2 and n not in _R6_WINDOW]
    assert rot[: len(r2_left)] == r2_left
    assert len(r2_left) == 42
    r3_head = [n for n, r in _DRIVER_GREEN.items() if r == 3][:8]
    assert rot[len(r2_left):] == r3_head
    # nothing in the proposal is already in this round's window
    assert not set(rot) & set(_R6_WINDOW)
