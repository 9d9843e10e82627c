"""Capture ``explain("formatted")`` for bench-flagged (or named) queries.

Writes one file per query to --out (default plans/r17), suffixed by
--tag (``before``/``after``). The judge reads these against
OPTIMIZATION_r17.md's plan claims; capture does not run the final
query (explain only) — note that queries whose BUILDERS eagerly
materialize intermediates (localCheckpoint(eager=True), driver-side
fit collects) still execute those jobs, exactly as they do when the
query is constructed anywhere else.

Checkpoint blindness fix (round 17, VERDICT r16 item 8): a
``localCheckpoint`` truncates lineage, so the final plan shows
``Scan ExistingRDD`` exactly where a rewritten hot path ran — the r16
``_after.txt`` files for checkpointed queries carried no evidence of
the stage the round changed. The capture now wraps
``DataFrame.localCheckpoint`` with a spy that records the
PRE-checkpoint plan of every checkpointed intermediate and appends
those fragments (innermost/first-checkpointed first) to the same
output file, so kernel nodes (MapInPandas / FlatMapGroupsInPandas /
ArrowEvalPython) and exchange counts of the materialized stages are
visible in the committed dumps.

Usage:
    python tools/capture_plans.py --tag before [--only n1,n2] [--all]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from market_pulse_data_pipeline_spark.queries import all_queries
from market_pulse_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r17")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--only", default=None)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="plan-capture")
    jvm = spark._jvm  # noqa: SLF001

    def explain_str(df: DataFrame) -> str:
        return jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )

    qs = all_queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    elif args.all:
        names = sorted(qs)
    else:
        names = sorted(n for n, q in qs.items() if q.bench)

    os.makedirs(args.out, exist_ok=True)

    fragments: list[str] = []
    # Spark 4 splits the public DataFrame into a dispatch base and the
    # classic implementation subclass; instance method resolution finds
    # the CLASSIC override first, so the spy must land there (patching
    # only pyspark.sql.DataFrame silently captures nothing).
    try:
        from pyspark.sql.classic.dataframe import (  # noqa: PLC0415
            DataFrame as _ClassicDF,
        )
    except ImportError:  # pragma: no cover - pre-4.0 layout
        _ClassicDF = DataFrame
    orig_lc = _ClassicDF.localCheckpoint

    def lc_spy(self, eager: bool = True):  # noqa: ANN001
        try:
            fragments.append(explain_str(self))
        except Exception as e:  # noqa: BLE001
            fragments.append(f"FRAGMENT EXPLAIN FAILED: {e!r}")
        return orig_lc(self, eager)

    _ClassicDF.localCheckpoint = lc_spy
    try:
        for name in names:
            fragments.clear()
            try:
                df = qs[name].spark(spark, args.sf)
                plan = explain_str(df)
            except Exception as e:  # noqa: BLE001
                plan = f"EXPLAIN FAILED: {e!r}"
            parts = [plan]
            for i, frag in enumerate(fragments, 1):
                parts.append(
                    f"\n\n== Pre-checkpoint fragment {i} "
                    "(build order; plan BELOW the checkpoint's "
                    "Scan ExistingRDD) ==\n" + frag
                )
            path = os.path.join(args.out, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write("".join(parts))
            print(name, "->", path)
    finally:
        _ClassicDF.localCheckpoint = orig_lc


if __name__ == "__main__":
    main()
