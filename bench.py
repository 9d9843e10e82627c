"""Headline benchmark — runs the bench-flagged queries from the registry
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized via the noop sink (forces every column
to be computed without driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_pulse_data_pipeline_spark.queries import all_queries
from market_pulse_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="market-pulse-bench")

    bench_queries = {n: q for n, q in all_queries().items() if q.bench}
    # warm-up: JVM / codegen / parquet footer caches, not measured
    warm = bench_queries["weekly_rollup"].spark(spark, sf_dir)
    warm.write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in bench_queries.items():
        t0 = time.time()
        df = q.spark(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
