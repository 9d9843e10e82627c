"""Machine-checked recompute discipline (SCALING.md "Recompute
discipline", round 12): a lazily-shared expensive subplan re-executes
once per consumer, and for iterative operators once per ROUND — the
round-12 sweep found dedup_cluster_assignment re-running its entire
n-gram Jaccard pipeline 20 times (160 document scans in the audited
plan). These pins hold the fixed shapes: each query's TOTAL audited
scan count (final plan + every eagerly-checkpointed stage, exactly
what tools/plan_audit.py folds together) must stay at the
materialize-once level. A regression that drops a checkpoint or adds
a lazy consumer multiplies the scan count well past the bound and
fails loudly here.

Bounds are deliberately loose (+1-2 over the audited value at the
time of pinning) so cosmetic plan changes don't flap the test; the
failure mode being guarded multiplies scans by the consumer or
iteration count, far beyond any slack.
"""

import pytest

from tools.plan_audit import CheckpointCapture, audit, merge, plan_texts

from market_pulse_data_pipeline_spark.queries import QUERY_REGISTRY

# query -> max audited parquet scans (final plan + checkpointed stages)
SCAN_BOUNDS = {
    # iterative: the edge/training input materializes BEFORE the loop
    "dedup_cluster_assignment": 4,     # was 160 pre-r12
    "winnowing_cluster_dedup": 4,      # was 40
    "pagerank_user_event_graph": 4,    # was 22
    "linear_regression_gd": 2,         # was 17
    # multi-consumer derived stages materialize once
    "containment_excerpt_dups": 6,     # was 16
    "dedup_ngram_jaccard": 4,          # was 8
    "doremi_excess_loss_reweight": 7,  # was 14
    "kmv_join_cardinality_estimate": 4,  # was 8
    "embedding_near_dups": 4,          # was 8
    "softdedup_commonness_reweight": 3,  # was 4 (join-free fold)
    "qc_join_multiplicity": 7,         # was 12 (one pass per relation)
}


@pytest.mark.parametrize("name", sorted(SCAN_BOUNDS))
def test_scan_count_stays_materialize_once(spark, sf_dir, name):
    with CheckpointCapture() as cap:
        df = QUERY_REGISTRY[name].spark(spark, sf_dir)
        m = audit(*plan_texts(df))
    for stage in cap.captured:
        merge(m, stage)
    assert m["n_scans"] <= SCAN_BOUNDS[name], (
        f"{name}: {m['n_scans']} audited scans > bound "
        f"{SCAN_BOUNDS[name]} — a shared pipeline is being recomputed "
        f"per consumer/iteration again (see SCALING.md 'Recompute "
        f"discipline')"
    )
