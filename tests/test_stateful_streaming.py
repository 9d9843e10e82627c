"""applyInPandasWithState: running per-user stats accumulate across
micro-batches and match the batch aggregate at end-of-stream."""

import pytest
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.sources.tables import load_table
from market_pulse_data_pipeline_spark.streaming.stateful import running_user_stats


def test_running_user_stats_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "events_src")
    # several files → several micro-batches (maxFilesPerTrigger=1)
    ev.repartition(5).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("mem_stats")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # latest state per user (the last update emitted across batches)
    got = spark.sql(
        """
        SELECT user_id, n_events, ROUND(total_value, 4) AS total_value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY n_events DESC) rn FROM mem_stats)
        WHERE rn = 1
        """
    ).collect()
    want = {
        r.user_id: (r.n, round(r.total, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert len(got) == len(want)
    mismatches = [
        (r.user_id, (r.n_events, r.total_value), want[r.user_id])
        for r in got
        if r.n_events != want[r.user_id][0]
        or abs(r.total_value - want[r.user_id][1]) > 1e-6
    ]
    assert mismatches == [], mismatches[:5]
