#!/usr/bin/env python
"""One-command round close: the four artifacts every round should
produce, in order, with one summary line each —

1. full test suite (pytest tests/ -q)
2. bench at sf0.1 (refreshes BENCH_DETAIL.json)
3. round-over-round drift table (tools/bench_drift.py, committed
   detail vs the fresh run)
4. one ledger-rotated multi-JVM sweep (tools/cluster_check.py)
5. the standing validation axes: adversarial edge corpus + its
   hostile-session twin (r9), hot-key skew replay, parallelism-
   invariance sweep (INVARIANCE_rNN.json) and registry-wide plan
   lint (PLAN_LINT_rNN.json) (r10)

    python tools/round_close.py [--skip-tests] [--skip-cluster]

Exit code 0 iff every stage passed.  Stages run sequentially (bench
and cluster timings need a quiet host).  This does NOT commit — read
the output, then commit BENCH_DETAIL.json + cluster_coverage.json and
any BENCH.md notes yourself.
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: driver-delta ratio beyond which the quiet-host A/B becomes REQUIRED
#: committed evidence, not optional prose (VERDICT r9 #5)
QUIET_TRIGGER = 1.15


def current_round() -> int:
    """The round being closed = newest driver round file + 1."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def quiet_bench_decision() -> tuple[bool, str, list[str]]:
    """Inspect the committed-vs-fresh BENCH_DETAIL drift: returns
    (triggered, reason, top-3 registry movers).  Triggered when any
    engine_* timing >= 0.1 s moved beyond QUIET_TRIGGER in either
    direction — the quiet A/B then turns the exoneration (or the
    confirmation) into a committed artifact."""
    spec = importlib.util.spec_from_file_location(
        "bench_drift_mod", os.path.join(REPO, "tools", "bench_drift.py"))
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    try:
        old = bd.load_detail("git:HEAD")
    except SystemExit:
        return False, "no committed BENCH_DETAIL.json to compare", []
    new = bd.load_detail(os.path.join(REPO, "BENCH_DETAIL.json"))
    d = bd.drift(old, new, QUIET_TRIGGER)
    eng = [
        (n, r) for n, a, b, r in d["movers"] if n.startswith("engine_")
    ]
    movers = [n for n, _a, _b, _r in d["movers"]
              if not n.startswith("engine_")][:3]
    if eng:
        worst = max(eng, key=lambda t: max(t[1], 1 / t[1] if t[1] else 0))
        return True, (
            f"engine family moved beyond {QUIET_TRIGGER}x vs committed "
            f"detail: worst {worst[0]} at {worst[1]:.2f}x"
        ), movers
    return False, f"engine family within {QUIET_TRIGGER}x", movers


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
    ap.add_argument("--skip-axes", action="store_true",
                    help="skip the skew-corpus replay and the "
                         "parallelism-invariance sweep (r10 axes)")
    ap.add_argument("--force-quiet", action="store_true",
                    help="run the quiet-host A/B even without an "
                         "engine-family trigger")
    ap.add_argument("--standalone", action="store_true",
                    help="also run the 2-executor standalone-cluster "
                         "smoke (tools/standalone_smoke.sh) — the five "
                         "engine headline shapes off local[N]; opt-in "
                         "because it binds fixed ports and adds ~3 min")
    args = ap.parse_args(argv)

    py = sys.executable
    stages: list[tuple[str, list[str]]] = []
    if not args.skip_tests:
        stages.append(("tests", [py, "-m", "pytest", "tests/", "-q"]))
    stages.append(("bench", [py, "bench.py"]))
    stages.append(("drift", [py, "tools/bench_drift.py"]))
    if args.standalone:
        stages.append(("standalone-smoke",
                       ["bash", "tools/standalone_smoke.sh"]))
    if not args.skip_cluster:
        stages.append(("cluster", [py, "tools/cluster_check.py"]))
    if not args.skip_axes:
        # r9 hostility gates, self-contained in the close: the
        # adversarial corpus sweep and its hostile-session twin over
        # the corpus-facing entries
        try:
            edge_only = subprocess.check_output(
                [py, "tools/edge_corpus.py", "--list-corpus"],
                cwd=REPO, text=True).split()
        except subprocess.CalledProcessError:
            edge_only = []
        stages.append(("edge-gen", [py, "tools/edge_corpus.py",
                                    "--out", "/tmp/edge_sf"]))
        if edge_only:
            stages.append(("edge-replay", [
                py, "tools/replay.py", "--sf-dir", "/tmp/edge_sf",
                "--only", *edge_only]))
            stages.append(("edge-hostile", [
                py, "tools/replay.py", "--sf-dir", "/tmp/edge_sf",
                "--hostile", "--only", *edge_only]))
        # r10 standing axes: hot-key skew (oracle-exact under 50% hot
        # source/user/vector/orderkey) and cluster-shape invariance
        # (same value hashes under three session shapes)
        stages.append(("skew-gen", [py, "tools/skew_corpus.py",
                                    "--out", "/tmp/skew_sf"]))
        stages.append(("skew-replay", [py, "tools/replay.py",
                                       "--sf-dir", "/tmp/skew_sf"]))
        stages.append(("invariance", [
            py, "tools/invariance.py",
            "--out", f"INVARIANCE_r{current_round():02d}.json"]))
        # registry-wide physical-plan audit: no CartesianProduct, no
        # row-at-a-time Python UDFs, shuffle budgets recorded per
        # entry for round-over-round comparison.  The drift baseline
        # is the newest report COMMITTED at HEAD (git: form), so a
        # failed-then-retried close never compares the round's fresh
        # report against itself
        lint_cmd = [py, "tools/plan_lint.py",
                    "--out", f"PLAN_LINT_r{current_round():02d}.json"]
        tracked = subprocess.run(
            ["git", "-C", REPO, "ls-files", "PLAN_LINT_r*.json"],
            capture_output=True, text=True).stdout.split()
        if tracked:
            # newest by PARSED round number, not lexicographic —
            # sorted()[-1] would pick r99 over r100 (ADVICE r10)
            def _lint_round(p: str) -> int:
                m = re.search(r"PLAN_LINT_r(\d+)\.json$", p)
                return int(m.group(1)) if m else -1

            lint_cmd += [
                "--compare", f"git:HEAD:{max(tracked, key=_lint_round)}"
            ]
        stages.append(("plan-lint", lint_cmd))
        # 10x/skew sweep directional gate (VERDICT r11 #4): any family
        # whose warm ratio moved >1.5x round-over-round in the newest
        # SCALE10/SKEW artifacts must carry the in-sweep recheck's
        # direction verdict; a bare-ratio mover fails the close
        stages.append(("sweep-drift", [py, "tools/sweep_drift.py"]))
        # driver-bench directional gate (VERDICT r12 #2): any query
        # that moved >1.5x between the two newest driver BENCH_rN
        # artifacts must carry an isolated best-of-3 direction verdict
        # in DRIVER_DRIFT_rN.json (tools/driver_drift.py --recheck)
        stages.append(("driver-drift", [py, "tools/driver_drift.py"]))

    # a replay over a FIXED /tmp corpus path must not run when the
    # stage that (re)generates that corpus failed — it would replay
    # stale data from a previous close and report a misleading
    # per-stage pass (ADVICE r10)
    stage_deps = {
        "edge-replay": "edge-gen",
        "edge-hostile": "edge-gen",
        "skew-replay": "skew-gen",
    }
    failed: list[str] = []
    skipped: list[str] = []  # dep-failed stages: not run, reported apart
    for label, cmd in stages:
        dep = stage_deps.get(label)
        if dep in failed:
            print(f"== {label}: SKIPPED (generator stage '{dep}' failed — "
                  "the fixed corpus path may hold stale data)")
            skipped.append(label)
            continue
        if not run(label, cmd):
            failed.append(label)

    # VERDICT r9 #5: whenever the engine family drifted beyond the
    # trigger vs the committed detail, the late/fresh A/B must exist
    # as BENCH_QUIET_rNN.json — evidence, not prose.
    try:
        triggered, reason, movers = quiet_bench_decision()
    except Exception as ex:  # noqa: BLE001 — the A/B is evidence, not a gate
        triggered, reason, movers = False, f"quiet decision failed: {ex}", []
    print(f"== quiet-bench trigger: {reason}"
          + (f"; top movers: {movers}" if movers else ""))
    if triggered or args.force_quiet:
        rnd = current_round()
        cmd = [py, "tools/quiet_bench.py", "--round", str(rnd),
               "--trigger", reason]
        if movers:
            cmd += ["--movers", *movers]
        if not run("quiet-bench", cmd):
            failed.append("quiet-bench")
        else:
            print(f"   -> BENCH_QUIET_r{rnd:02d}.json (commit it with "
                  "BENCH_DETAIL.json)")

    # skipped stages never ran — the summary names them separately so
    # one root-cause generator failure doesn't read as N failures
    # (ADVICE r11); the exit stays non-zero either way (a skip means a
    # standing gate has NO evidence this close)
    verdict = "all green"
    if failed or skipped:
        verdict = f"FAILED: {failed}"
        if skipped:
            verdict += f"; SKIPPED (dep failed, not run): {skipped}"
    print(f"\nROUND CLOSE: {verdict}")
    return 1 if (failed or skipped) else 0


if __name__ == "__main__":
    sys.exit(main())
