"""functions/prefix.py: the two-phase distributed prefix sum must be
bit-identical to the serial single-partition window, for any range
count, including degenerate ones."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.prefix import (
    partitioned_prefix_sum,
)
from market_pulse_data_pipeline_spark.sources.tables import load_table


@pytest.mark.parametrize("n_ranges", [1, 3, 8, 64])
def test_two_phase_equals_serial_window(spark, sf_dir, n_ranges):
    ev = load_table(spark, sf_dir, "events")
    serial_w = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    serial = ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(serial_w)
        .alias("running_total"),
    )
    two_phase = partitioned_prefix_sum(
        ev, ["ts", "event_id"], F.col("value"), n_ranges=n_ranges
    ).select("event_id", "running_total")
    assert two_phase.exceptAll(serial).count() == 0
    assert serial.exceptAll(two_phase).count() == 0
