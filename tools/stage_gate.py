"""One-command triple gate for a staged batch.

Every staged query lands with the same three verifications before it
may ever flip to ``@register``:

1. check_oracle --staging at sf0.001, sf0.01 AND sf0.1 (value-hash
   parity against DuckDB at three data shapes), and
2. hostile_check --chaos --staging (bare SparkSession, half-hour-offset
   process timezone, 5 cores / 7 shuffle partitions).

Rounds 7-11 ran those as four hand-typed commands per batch; this
wraps them so the gate is one line and the PASS/FAIL summary is one
block. Subprocess-per-step on purpose: hostile_check must set TZ
before any JVM starts, so the sweeps cannot share this process.

Usage:
    python tools/stage_gate.py --only name1,name2      # gate a batch
    python tools/stage_gate.py                          # gate ALL staged
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"]


def _run(label: str, cmd: list[str]) -> bool:
    t0 = time.time()
    r = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True)
    ok = r.returncode == 0
    dt = time.time() - t0
    print(f"  {'PASS' if ok else 'FAIL'}  {label}  [{dt:.1f}s]")
    if not ok:
        tail = (r.stdout + r.stderr).splitlines()[-15:]
        for line in tail:
            print(f"    | {line}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated staged query names")
    args = ap.parse_args()
    sel = ["--only", args.only] if args.only else []
    py = sys.executable

    steps: list[tuple[str, list[str]]] = [
        (
            f"check_oracle --staging @ {os.path.basename(sf)}",
            [py, "tools/check_oracle.py", "--staging", "--sf", sf, *sel],
        )
        for sf in _SFS
    ]
    steps.append(
        (
            "hostile_check --chaos --staging",
            [py, "tools/hostile_check.py", "--chaos", "--staging", *sel],
        )
    )

    print(f"stage gate: {args.only or 'ALL staged candidates'}")
    results = [_run(label, cmd) for label, cmd in steps]
    if all(results):
        print("TRIPLE GATE PASSED")
        return 0
    print("TRIPLE GATE FAILED")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
