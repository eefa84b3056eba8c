#!/usr/bin/env python
"""Round-13 measurement batch (VERDICT r12 asks #3/#4/#5 + ADVICE
bpe storage-level question).  One quiet-host run, one JSON line per
measurement to stdout; BENCH.md records the verdicts.

  A. graph_pagerank checkpoint-rotation cost A/B (ask #3):
     isolated best-of-3 with/without blockstore.free_checkpoint, on
     the sf0.1 bipartite graph and the 10x corpus graph.
  B. BPE symbol-table storage-level A/B (ADVICE r12): 24 merges
     batch=16 cascade, DISK_ONLY vs MEMORY_AND_DISK, sf0.1 + 10x.
  C. engine ingest at 10M ticks (ask #4): the ref_bench A/B shape on
     /tmp/sf_scale100 events, best-of-3 fresh-store laps — re-pins
     the 3.3 M rows/s headline on the r13 tree.
  D. BPE driver-rows growth-law spot check (ask #5): driver_rows_max
     and memo_peak at 50 / 250 / 1000 accepted merges on the sf0.1
     documents corpus — the per-round driver residency is bounded by
     G x top-K regardless of merge count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402


def best_of(fn, runs=3, discard_first=True):
    if discard_first:
        fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])  # e.g. A B C D; empty = all
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r13-measurements")
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
    from ong_tsdb_spark.operators import graph as graph_mod
    from ong_tsdb_spark.plans import bpe

    # ---------------------------------------------------------- A
    if not only or "A" in only:
        # Patch point matters (ADVICE r13): CheckpointRotation frees go
        # through blockstore.free_checkpoint (module global), while
        # graph.py's direct end-of-call frees go through its imported
        # name — the no-free side must null BOTH, and the free sides
        # must exercise the per-supersession path, which backlog=2 with
        # iters=6 never reaches (one supersession, absorbed by the
        # backlog).  Three-way cell: no frees at all / strict
        # per-supersession (rotation_backlog=0) / the shipped backlog-2
        # policy — on the LIVE CheckpointRotation code path.
        from ong_tsdb_spark import blockstore as blockstore_mod

        real_free_bs = blockstore_mod.free_checkpoint
        real_free_g = graph_mod.free_checkpoint
        for d, tag in ((sf_dir, "sf0.1"), ("/tmp/sf_scale10", "10x")):
            if not os.path.isdir(d):
                print(json.dumps({"measure": "pagerank_rotation_ab",
                                  "corpus": tag, "skipped": "no corpus"}))
                continue
            li = entry_queries.load(spark, d, "lineitem")
            edges = li.select(
                F.col("l_orderkey").alias("src"),
                (F.lit(1_000_000_000) + F.col("l_partkey")).alias("dst"),
            )
            res = {}
            cells = (
                ("without_free", None, 2),
                ("free_backlog0", real_free_bs, 0),
                ("free_backlog2", real_free_bs, 2),
            )
            try:
                for side, free_fn, backlog in cells:
                    noop = lambda _df: None  # noqa: E731
                    blockstore_mod.free_checkpoint = free_fn or noop
                    graph_mod.free_checkpoint = (
                        real_free_g if free_fn else noop
                    )
                    bench.release_blocks(spark)
                    res[side] = round(best_of(
                        lambda: graph_mod.pagerank_exact(
                            edges, iters=6, checkpoint_every=1,
                            rotation_backlog=backlog,
                        ).count()
                    ), 4)
                    bench.release_blocks(spark)
            finally:
                blockstore_mod.free_checkpoint = real_free_bs
                graph_mod.free_checkpoint = real_free_g
            res["backlog0_overhead_pct"] = round(
                100.0 * (res["free_backlog0"] / res["without_free"] - 1.0), 1)
            res["backlog2_overhead_pct"] = round(
                100.0 * (res["free_backlog2"] / res["without_free"] - 1.0), 1)
            print(json.dumps({"measure": "pagerank_rotation_ab",
                              "corpus": tag, **res}), flush=True)

    # ---------------------------------------------------------- B
    if not only or "B" in only:
        for d, tag in ((sf_dir, "sf0.1"), ("/tmp/sf_scale10", "10x")):
            if not os.path.isdir(d):
                continue
            docs = entry_queries.load(spark, d, "documents")
            res = {}
            for lvl_name, lvl in (("DISK_ONLY", StorageLevel.DISK_ONLY),
                                  ("MEMORY_AND_DISK",
                                   StorageLevel.MEMORY_AND_DISK)):
                bench.release_blocks(spark)
                res[lvl_name] = round(best_of(
                    lambda: bpe.train_bpe_merges(
                        docs, n_merges=24, batch=16, storage_level=lvl),
                    runs=2,
                ), 4)
                bench.release_blocks(spark)
            res["memdisk_speedup_pct"] = round(
                100.0 * (1.0 - res["MEMORY_AND_DISK"] / res["DISK_ONLY"]), 1)
            print(json.dumps({"measure": "bpe_storage_level_ab",
                              "corpus": tag, **res}), flush=True)

    # ---------------------------------------------------------- C
    if not only or "C" in only:
        import shutil
        import tempfile

        from ong_tsdb_spark import OngTsdbSpark
        from ong_tsdb_spark.functions.timeseries import epoch_us

        d100 = "/tmp/sf_scale100"
        if not os.path.isdir(d100):
            print(json.dumps({"measure": "ingest_10m", "skipped": "no corpus"}))
        else:
            ev = entry_queries.load(spark, d100, "events")
            ticks = ev.select(
                (epoch_us(ev, "ts") / F.lit(1e6)).alias("ts_sec"),
                F.col("value").cast("double").alias("value"),
            ).localCheckpoint(eager=True)  # input derivation OFF the clock
            n = ticks.count()
            laps = []
            for _ in range(3):
                base = tempfile.mkdtemp(prefix="ing10m_")
                eng = OngTsdbSpark(spark, base)
                eng.create_db("bench")
                eng.create_sensor("bench", "events_1s", "1s", ["value"])
                t0 = time.perf_counter()
                eng.write_spark_df("bench", "events_1s", ticks)
                laps.append(time.perf_counter() - t0)
                shutil.rmtree(base, ignore_errors=True)
            best = min(laps)
            print(json.dumps({
                "measure": "ingest_10m", "n_ticks": n,
                "laps": [round(x, 3) for x in laps],
                "best_s": round(best, 3),
                "rows_per_s": round(n / best),
                "r6_row": {"best_s": 3.0, "rows_per_s": 3_300_000},
            }), flush=True)
            bench.release_blocks(spark)

    # ---------------------------------------------------------- D
    if not only or "D" in only:
        docs = entry_queries.load(spark, sf_dir, "documents")
        rows = []
        for n_merges in (50, 250, 1000):
            bench.release_blocks(spark)
            t0 = time.perf_counter()
            merges = bpe.train_bpe_merges(docs, n_merges=n_merges, batch=64)
            rows.append({
                "n_merges": n_merges, "accepted": len(merges),
                "sec": round(time.perf_counter() - t0, 1),
                "rounds": int(bpe.LAST_TRAIN_ROUNDS),
                "driver_rows_max": max(bpe.LAST_DRIVER_ROWS or [0]),
                "memo_peak": int(bpe.LAST_MEMO_PEAK),
            })
            bench.release_blocks(spark)
            print(json.dumps({"measure": "bpe_growth_law",
                              **rows[-1]}), flush=True)
        bound = bpe.CASCADE_G * bpe.CASCADE_TOPK
        print(json.dumps({"measure": "bpe_growth_law_summary",
                          "g_x_topk_bound": bound,
                          "rows": rows}), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
