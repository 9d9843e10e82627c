"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB on the same parquet tables, then compares row count, schema
(column names), and an order-insensitive value hash (columns sorted by
name, rows sorted, values stringified). Exit code 1 on any mismatch.

Usage:
    python tools/check_oracle.py [--sf DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from market_pulse_data_pipeline_spark.schemas import TESTDATA_TABLES


def value_repr(v) -> str:
    # The driver's harness canonicalizes through pandas sort_values,
    # which cannot factorize container values — mirror that constraint
    # here so an array-typed output column fails locally first
    # (round-2 lesson: embedding_int8_quantize).
    if isinstance(v, (list, dict, set, bytearray)) or type(v).__name__ == "ndarray":
        raise TypeError(
            "container value in result column (driver-unhashable): "
            + repr(v)[:80]
        )
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    return str(v)


def frame_fingerprint(columns, rows) -> tuple[int, tuple, str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = tuple(columns[i] for i in order)
    lines = sorted("\x1f".join(value_repr(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from market_pulse_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            srows = sdf.collect()
            s_fp = frame_fingerprint(sdf.columns, [tuple(r) for r in srows])
        except Exception as e:  # mirror the driver: an err is a red row
            print(f"  {name:34s} ERR  {type(e).__name__}: {e}")
            failures.append((name, f"{type(e).__name__}: {e}"))
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"  {name:34s} rows={s_fp[0]:>8} (rows-only, no oracle) "
                  f"[{spark_t:.1f}s]")
            if s_fp[0] == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        cols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        o_fp = frame_fingerprint(cols, orows)
        duck_t = time.time() - t0
        ok = s_fp == o_fp
        status = "OK " if ok else "FAIL"
        print(f"  {name:34s} {status} rows={s_fp[0]:>8} hash={s_fp[2]} "
              f"[spark {spark_t:.1f}s, duckdb {duck_t:.1f}s]")
        if not ok:
            failures.append((name, f"spark={s_fp} oracle={o_fp}"))
            if s_fp[1] != o_fp[1]:
                print(f"    schema: spark={s_fp[1]} oracle={o_fp[1]}")
            elif s_fp[0] != o_fp[0]:
                print(f"    rowcount: spark={s_fp[0]} oracle={o_fp[0]}")
            else:
                s_set = {tuple(r) for r in ([tuple(x) for x in srows])}
                o_set = {tuple(r) for r in orows}
                samp_s = list(s_set - o_set)[:3]
                samp_o = list(o_set - s_set)[:3]
                print(f"    spark-only sample: {samp_s}")
                print(f"    oracle-only sample: {samp_o}")

    print()
    if failures:
        print(f"{len(failures)} FAILURE(S):")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print(f"all {len([n for n in qs if not only or n in only])} queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
