"""Driver-contract query registry.

Each entry pairs a Spark DataFrame implementation with an equivalent
ANSI-SQL oracle that DuckDB runs on the same parquet tables
(CORRECTNESS gate, see /root/repo/__spark_entry__.py). Column names and
types are aligned on both sides; float aggregates go through an exact
decimal sum so the value-hash is independent of partial-aggregation
order (see queries.common).
"""

from __future__ import annotations

from market_pulse_data_pipeline_spark.queries.common import QUERY_REGISTRY, QueryDef  # noqa: F401

# importing the modules registers their queries
from market_pulse_data_pipeline_spark.queries import reference  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import tpch  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import text  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import dedup  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import similarity  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import events  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import scale_paths  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import analytics  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import asof  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import streaming_evidence  # noqa: F401, E402
from market_pulse_data_pipeline_spark.queries import corpus  # noqa: F401, E402


# Names that already have a driver-green CORRECTNESS row (round 2).
# The driver's correctness harness snapshots exactly the FIRST 50 entries
# of queries() in iteration order, so queries that have never received a
# driver-witnessed row must register ahead of the already-witnessed ones.
# all_queries() therefore orders: (1) never-witnessed + new queries, in
# registration order; (2) the round-2 greens below, in registration
# order. As rows turn green in CORRECTNESS_r{N}, move them into this set
# so the window rotates to whatever is still unwitnessed.
_DRIVER_GREEN = {
    # CORRECTNESS_r02.json — 49 green rows (embedding_int8_quantize errs
    # there and is deliberately NOT listed: its fixed output shape needs
    # a fresh driver row).
    "weekly_rollup", "json_path_extract", "explode_words",
    "dim_case_mapping", "left_join_enrich", "derived_metrics",
    "distinct_keys", "keyed_upsert", "dedup_keep_latest",
    "incremental_merge", "qc_not_null_violations", "qc_unique_violations",
    "map_explode_props", "variant_path_extract", "qc_anti_join_orphans",
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
}


def all_queries():
    unwitnessed = {
        n: q for n, q in QUERY_REGISTRY.items() if n not in _DRIVER_GREEN
    }
    witnessed = {n: q for n, q in QUERY_REGISTRY.items() if n in _DRIVER_GREEN}
    return {**unwitnessed, **witnessed}
