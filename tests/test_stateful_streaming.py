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


def test_state_ttl_evicts_and_restarts(spark, tmp_path):
    """With state_ttl, a quiet user's state is evicted once the watermark
    passes last_event + ttl; a later event starts a fresh accumulator."""
    import os
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    src = tmp_path / "ttl_src"
    src.mkdir()

    def write_batch(name, rows, mtime):
        df = spark.createDataFrame(
            [(u, (t0 + dt).to_pydatetime(), v) for u, dt, v in rows], schema
        )
        path = str(src / name)
        df.coalesce(1).write.parquet(path)
        for root, _, files in os.walk(path):
            for fn in files:
                os.utime(os.path.join(root, fn), (mtime, mtime))

    # batch order via mtime: A+B early; B later batches advance the
    # watermark past A's ttl while A is quiet (timeouts only fire for
    # keys with no data in the batch); then A returns in its own batch
    write_batch("b0", [(1, 0 * h, 1.0), (1, 0 * h, 2.0), (2, 0 * h, 1.0)], 1000)
    write_batch("b1", [(2, 10 * h, 1.0)], 2000)
    write_batch("b2", [(2, 20 * h, 1.0)], 3000)
    write_batch("b3", [(1, 21 * h, 5.0)], 4000)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        running_user_stats(stream, watermark="1 hour", state_ttl="2 hours")
        .writeStream.format("memory")
        .queryName("mem_ttl")
        .option("checkpointLocation", str(tmp_path / "ck_ttl"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM mem_ttl ORDER BY user_id, n_events").collect()
    a_counts = [r.n_events for r in rows if r.user_id == 1]
    b_counts = [r.n_events for r in rows if r.user_id == 2]
    # user 1: first batch accumulates 2 events; after eviction the late
    # event restarts at 1 (NOT 3 — that would mean state survived the ttl)
    assert 2 in a_counts and 1 in a_counts and 3 not in a_counts
    # user 2 has data in every batch, so it never times out (timeouts
    # fire only for quiet keys) and keeps accumulating
    assert sorted(b_counts) == [1, 2, 3]
