"""CLI entry — run the full Market-Pulse pipeline locally.

    python -m market_pulse_data_pipeline_spark \
        --landing /tmp/mp/landing --warehouse /tmp/mp/warehouse [--fixtures]

Equivalent to the reference's Airflow DAG run (fetch → load → transform
→ qc) minus the scheduler; `--fixtures` lands the deterministic synthetic
documents first (no network in this environment).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="market_pulse_data_pipeline_spark")
    ap.add_argument("--landing", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--fixtures", action="store_true",
                    help="write deterministic fixture docs into --landing first")
    ap.add_argument("--days", type=int, default=60)
    args = ap.parse_args(argv)

    from market_pulse_data_pipeline_spark.pipeline import run_pipeline
    from market_pulse_data_pipeline_spark.session import get_spark
    from market_pulse_data_pipeline_spark.sources.alphavantage import (
        default_fixture_docs,
        write_fixture_landing,
    )

    if args.fixtures:
        write_fixture_landing(args.landing, default_fixture_docs(args.days))

    spark = get_spark(app_name="market-pulse-pipeline")
    tables, qc = run_pipeline(spark, args.landing, args.warehouse)

    for name in ("raw_alphavantage", "stg_alphavantage", "dim_stock",
                 "fact_stock_prices", "agg_weekly_prices", "agg_weekly_ohlc"):
        print(f"{name:22s} rows={tables[name].count()}")
    print()
    failed = 0
    for r in qc:
        mark = "PASS" if r.passed else "FAIL"
        print(f"  [{mark}] {r.test:14s} {r.table}.{','.join(r.columns)}"
              f" violations={r.violations}")
        failed += 0 if r.passed else 1
    print(f"\nqc: {len(qc) - failed}/{len(qc)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
