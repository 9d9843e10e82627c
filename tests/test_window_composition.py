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

from market_pulse_data_pipeline_spark.queries import all_queries

# Round-4 rotation: sessionization re-witnessed at slot 1 (oracle
# HUGEINT fix), the four same-bug queries, CDC family, sketch suite,
# indicator suite, then FIFO registration-order unwitnessed queries.
EXPECTED_WINDOW = [
    "sessionization", "running_distinct_event_types",
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
    "vocab_top_tokens", "cross_corpus_dedup_exact", "doc_chunking",
    "mixture_rebalanced_sample", "bernoulli_sample_hash",
    "corpus_pipeline_end_to_end", "corpus_quality_filter",
]


def test_window_is_the_verified_composition():
    assert list(all_queries())[:50] == EXPECTED_WINDOW


def test_window_has_full_oracles():
    q = all_queries()
    rows_only = [n for n in list(q)[:50] if q[n].oracle is None]
    assert rows_only == [], (
        "rows-only query inside the 50-row window wastes a hash-checked "
        f"slot: {rows_only}"
    )
