#!/usr/bin/env python
"""Automated physical-plan audit over the whole registry — the
machine-checkable version of the per-round "plan audit of the most
expensive queries".

For every ``__spark_entry__.queries()`` entry this builds the result
DataFrame and lints its physical plan string for the anti-patterns
that kill 100 TB runs:

ERRORS (exit 1):
- ``CartesianProduct``      — a non-broadcast cross product; O(n*m)
  shuffle-and-compare, never acceptable on corpus-sized inputs.
- ``BatchEvalPython``       — a row-at-a-time Python UDF in the plan;
  the 10-100x-slower path the repo bans (Arrow variants show up as
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are fine).

WARNINGS (reported, non-fatal):
- ``BroadcastNestedLoopJoin`` — benign for the repo's 1-row broadcast
  stats frames, but counted so silent growth shows round-over-round.
- per-entry ``Exchange`` count — the shuffle budget; a jump in an
  entry's count between rounds is a regression even when timings hide
  it in noise.

Scope note: entries that internally execute jobs and return a final
frame (streaming ledgers, k-means, BPE) are linted on the RETURNED
frame's plan only — their internal stages are covered by the scale
sweeps, not this lint.

    python tools/plan_lint.py [--sf-dir /root/testdata/sf0.001]
                              [--only NAME ...] [--out PLAN_LINT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ERROR_NODES = ("CartesianProduct", "BatchEvalPython")
WARN_NODES = ("BroadcastNestedLoopJoin",)


def lint_plan(plan: str) -> dict:
    """Count red-flag nodes in one physical-plan string."""
    out = {
        "errors": {n: plan.count(n) for n in ERROR_NODES if n in plan},
        "warnings": {n: plan.count(n) for n in WARN_NODES if n in plan},
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
    }
    return out


def load_report(src: str) -> dict:
    """A report from a path, or from git via ``git:<rev>:<name>``
    (``git::PLAN_LINT_r10.json`` reads HEAD) — the committed-baseline
    form round_close uses so a failed-then-retried close never
    compares a round's report against itself."""
    if src.startswith("git:"):
        import subprocess

        rev, _, name = src[4:].partition(":")
        proc = subprocess.run(
            ["git", "-C", REPO, "show", f"{rev or 'HEAD'}:{name}"],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise SystemExit(
                f"no {name} at {rev or 'HEAD'} ({proc.stderr.strip()})")
        return json.loads(proc.stdout)
    return json.load(open(src))


def budget_drift(old: dict, new: dict) -> list[tuple[str, object, object]]:
    """Entries present in both reports whose Exchange count changed."""
    out = []
    for name, row in sorted(new.items()):
        if name in old and "exchanges" in row and "exchanges" in old[name]:
            a, b = old[name]["exchanges"], row["exchanges"]
            if a != b:
                out.append((name, a, b))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", default=None,
                    help="a PLAN_LINT_rNN.json path, or git:<rev>:<name> "
                         "to read the COMMITTED report (so a same-round "
                         "re-run never compares against its own fresh "
                         "file); print every entry whose Exchange count "
                         "changed — shuffle-budget drift is a regression "
                         "even when timing noise hides it")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(args.master)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    explain = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.only or list(qs)
    report, flagged = {}, []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf_dir)
            plan = explain(df._jdf.queryExecution(), "simple")
            row = lint_plan(plan)
        except Exception as e:  # pragma: no cover - diagnostic path
            row = {"errors": {"EXCEPTION": 1},
                   "detail": f"{type(e).__name__}: {e}"[:200]}
        report[name] = row
        status = "FLAG" if row["errors"] else "ok"
        if row["errors"]:
            flagged.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} "
              f"exchanges={row.get('exchanges', '?')} "
              f"{row['errors'] or ''}{row.get('warnings') or ''} "
              f"({time.time() - t0:.1f}s)", flush=True)

    warn_total = sum(
        1 for r in report.values() if r.get("warnings"))
    print(f"\nPLAN LINT: {len(names) - len(flagged)}/{len(names)} clean; "
          f"errors in {flagged or 'none'}; "
          f"{warn_total} entries with BroadcastNestedLoopJoin (expected: "
          f"the 1-row broadcast stats crossJoins)")
    if args.compare:
        old = load_report(args.compare)
        drift = budget_drift(old, report)
        for name, a, b in drift:
            print(f"SHUFFLE-BUDGET drift: {name} {a} -> {b} exchanges")
        if not drift:
            print(f"shuffle budgets unchanged vs {args.compare}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"report -> {args.out}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
