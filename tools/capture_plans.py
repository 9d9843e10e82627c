"""Capture ``explain("formatted")`` for bench-flagged (or named) queries.

Writes one file per query to --out (default plans/r16), suffixed by
--tag (``before``/``after``). The judge reads these against
OPTIMIZATION_r16.md's plan claims; capture is read-only — no query is
executed (explain only), so it is safe to run alongside other work.

Usage:
    python tools/capture_plans.py --tag before [--only n1,n2] [--all]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_pulse_data_pipeline_spark.queries import all_queries
from market_pulse_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--only", default=None)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="plan-capture")
    qs = all_queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    elif args.all:
        names = sorted(qs)
    else:
        names = sorted(n for n, q in qs.items() if q.bench)

    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = qs[name].spark(spark, args.sf)
            jvm = spark._jvm  # noqa: SLF001
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"  # noqa: SLF001
            )
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(name, "->", path)


if __name__ == "__main__":
    main()
