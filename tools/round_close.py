#!/usr/bin/env python
"""One-command round close: the four artifacts every round should
produce, in order, with one summary line each —

1. full test suite (pytest tests/ -q)
2. bench at sf0.1 (refreshes BENCH_DETAIL.json)
3. round-over-round drift table (tools/bench_drift.py, committed
   detail vs the fresh run)
4. one ledger-rotated multi-JVM sweep (tools/cluster_check.py)

    python tools/round_close.py [--skip-tests] [--skip-cluster]

Exit code 0 iff every stage passed.  Stages run sequentially (bench
and cluster timings need a quiet host).  This does NOT commit — read
the output, then commit BENCH_DETAIL.json + cluster_coverage.json and
any BENCH.md notes yourself.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], tail: int = 3) -> bool:
    t0 = time.time()
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    out = (proc.stdout + proc.stderr).strip().splitlines()
    for line in out[-tail:]:
        print(f"   {line}", flush=True)
    ok = proc.returncode == 0
    print(f"== {label}: {'OK' if ok else f'FAILED (exit {proc.returncode})'} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-cluster", action="store_true")
    args = ap.parse_args(argv)

    py = sys.executable
    stages: list[tuple[str, list[str]]] = []
    if not args.skip_tests:
        stages.append(("tests", [py, "-m", "pytest", "tests/", "-q"]))
    stages.append(("bench", [py, "bench.py"]))
    stages.append(("drift", [py, "tools/bench_drift.py"]))
    if not args.skip_cluster:
        stages.append(("cluster", [py, "tools/cluster_check.py"]))

    failed = [label for label, cmd in stages if not run(label, cmd)]
    print(f"\nROUND CLOSE: {'all green' if not failed else f'FAILED: {failed}'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
