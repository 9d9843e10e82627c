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

EXPECTED_WINDOW = [
    "sessionization", "event_hourly_windows", "event_sliding_windows",
    "dedup_cluster_assignment", "market_pulse_end_to_end",
    "minhash_lsh_portable", "asof_join_latest_anchor",
    "range_join_price_bands", "rolling_avg_7rows", "weekly_ohlc",
    "embedding_int8_quantize", "streaming_ingest_upsert",
    "streaming_windowed_agg", "pivot_lang_counts", "rollup_qty",
    "cube_counts", "top3_per_supplier", "semi_join_big_spenders",
    "set_ops_nations", "except_user_event_pairs", "lag_lead_weekly",
    "regr_slope_by_event_type", "value_histogram_by_event_type",
    "corr_quantity_price_by_flag", "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit", "tpch_q11_important_stock",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_stock_suppliers", "tpch_q21_waiting_suppliers",
    "exact_substring_spans", "label_centroid_pairwise_cosine",
    "session_window_native", "retention_cohorts",
    "event_funnel_signup_purchase", "media_frame_sample",
    "numeric_functions_suite", "zscore_outliers", "bool_aggregates",
    "variance_by_event_type", "regex_extract_props",
    "percentiles_by_event_type", "approx_distinct_parts",
    "collect_sorted_event_types", "string_functions_suite",
    "date_functions_suite", "approx_percentiles_events",
    "full_outer_reconciliation", "array_functions_suite",
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
