#!/usr/bin/env python
"""100x upward-scale sweep over the FULL scale-family set (round 13).

The round-6 SCALE100 datapoint covered 14 families; the registry has
since grown to 50 scale families (graph, ledgers, packing/shard
layouts, PQ/IVF, curation).  This one-off re-runs the whole set on a
100x replica corpus (tools/gen_scale.py shape contracts: duplicate
rate and block size constant, ids offset/namespaced) so the
1000-executor extrapolation rests on measured curves for EVERY family,
not the r6 subset.

    python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf_scale100 100
    python tools/scale100.py [--corpus /tmp/sf_scale100] > SCALE100_rNN.json

Per family: cold (first run) and warm (best of bench.RUNS) at 1x and
100x; plus the BPE trainer's 24-merge batched row (cold only — the
trainer is iterative, there is no warm rerun).  Prints the BENCH.md
table to stderr and ONE JSON line to stdout.  No drift adjudication —
this is a point-in-time curve, not a per-round gated artifact (the
gated sweep stays SCALE10)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/sf_scale100")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=None,
                    help="warm laps per cell (default bench.RUNS); the "
                         "r13 single-lap run produced a warm>cold "
                         "anomaly for dedup_minhash_lsh — measurement-"
                         "grade sweeps want >=2")
    args = ap.parse_args()
    if not os.path.isdir(args.corpus):
        raise SystemExit(f"{args.corpus} missing — run tools/gen_scale.py first")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale100")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from ong_tsdb_spark import entry_queries

    runs = args.runs if args.runs is not None else bench.RUNS
    registry = entry_queries.queries()
    out: dict[str, dict[str, float]] = {}
    for name in bench.SCALE_FAMILIES:
        fn = registry[name]
        rec: dict[str, float] = {}
        for tag, d in (("x1", args.sf_dir), ("x100", args.corpus)):
            t0 = time.perf_counter()
            fn(spark, d).count()
            rec[f"{tag}_cold"] = round(time.perf_counter() - t0, 4)
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            rec[f"{tag}_warm"] = round(best, 4)
            bench.release_blocks(spark)
        rec["ratio_warm"] = round(rec["x100_warm"] / rec["x1_warm"], 2)
        out[name] = rec
        print(
            f"[scale100] {name}: 1x {rec['x1_warm']:.2f}s "
            f"100x {rec['x100_warm']:.2f}s (warm ratio {rec['ratio_warm']}x)",
            file=sys.stderr, flush=True,
        )

    from ong_tsdb_spark.plans import bpe

    rec = {}
    for tag, d in (("x1", args.sf_dir), ("x100", args.corpus)):
        docs = entry_queries.load(spark, d, "documents")
        t0 = time.perf_counter()
        bpe.train_bpe_merges(docs, n_merges=24, batch=16)
        rec[f"{tag}_cold"] = round(time.perf_counter() - t0, 4)
        bench.release_blocks(spark)
    rec["ratio_cold"] = round(rec["x100_cold"] / rec["x1_cold"], 2)
    rec["rounds"] = float(bpe.LAST_TRAIN_ROUNDS)
    out["bpe_train_batched"] = rec
    print(
        f"[scale100] bpe_train_batched: 1x {rec['x1_cold']:.2f}s "
        f"100x {rec['x100_cold']:.2f}s (ratio {rec['ratio_cold']}x, "
        f"{int(rec['rounds'])} rounds at 100x)",
        file=sys.stderr, flush=True,
    )

    print("\n| query | 1x warm | 100x warm | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, r in sorted(out.items(),
                          key=lambda kv: -kv[1].get("ratio_warm", 0)):
        if "ratio_warm" in r:
            print(f"| {name} | {r['x1_warm']:.2f} | {r['x100_warm']:.2f} "
                  f"| {r['ratio_warm']}x |", file=sys.stderr)
    print(json.dumps({
        "metric": "scale100_families",
        "runs": runs,
        "value": round(sum(r.get("x100_warm", r.get("x100_cold", 0.0))
                           for r in out.values()), 4),
        "unit": "sec",
        "queries": out,
        "sf": "100x-" + args.sf_dir.rstrip("/").split("sf")[-1],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
