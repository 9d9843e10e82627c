"""operators/qc.py::observed_write_qc — QC counters must ride the main
action (no extra job) and agree with the standalone check_* passes."""

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.qc import (
    check_not_null,
    observed_write_qc,
)
from market_pulse_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_observed_matches_standalone_checks(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "value", F.when(F.col("event_id") % 11 == 0, None).otherwise(F.col("value"))
    )
    observed, obs = observed_write_qc(
        ev,
        not_null_cols=["value", "user_id"],
        accepted_values={"event_type": ["click", "view", "purchase"]},
    )
    # ONE action materializes data AND metrics
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["null_value"] == check_not_null(ev, "events", "value").violations
    assert got["null_user_id"] == 0
    bad = ev.filter(
        ~F.col("event_type").isin(["click", "view", "purchase"])
        | F.col("event_type").isNull()
    ).count()
    assert got["bad_event_type"] == bad
    assert bad > 0  # fixture has event types outside the allowed list
