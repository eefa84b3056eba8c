#!/usr/bin/env python
"""Two-executor standalone-cluster smoke for the engine headline
queries (VERDICT r13 #7).

Everything else in the repo runs on ``local[N]`` — a single JVM where
driver and executors share a block manager, which can hide
cluster-only failure modes: executor Python workers that don't inherit
the driver's ``sys.path``, closures that capture driver-process state,
localCheckpoint blocks assumed reachable from the driver, missing
``spark.executorEnv`` plumbing.  This smoke runs the five engine
headline shapes (ingest / upsert / range read / last-timestamp / 7-day
serve read) against a REAL standalone master with two separate worker
JVMs on this host.

Usage (tools/standalone_smoke.sh orchestrates this):

    spark-class org.apache.spark.deploy.master.Master -h 127.0.0.1 &
    spark-class org.apache.spark.deploy.worker.Worker \
        spark://127.0.0.1:7077 -c 8 -m 8g &   # x2
    python tools/standalone_smoke.py --master spark://127.0.0.1:7077

Prints one JSON line: the five engine numbers + executor count.

Cluster-behavior notes this smoke pins (also in BENCH.md):

* ``blockstore.free_checkpoint`` releases localCheckpoint blocks via
  ``rdd.unpersist`` — a DRIVER-initiated, cluster-wide RPC that works
  identically on standalone; what changes off-local is durability
  (executor loss drops localCheckpoint blocks and fails the lineage —
  the documented localCheckpoint trade; use reliable checkpoints on
  preemptible fleets).
* the engine's Python edges (pandas_edge, mapInPandas batch fns) are
  written self-contained, but executor workers still need the PACKAGE
  importable — ``spark.executorEnv.PYTHONPATH`` here plays the role a
  wheel/``--py-files`` deploy plays on a real fleet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="spark://127.0.0.1:7077")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--executor-cores", type=int, default=8)
    ap.add_argument("--executor-mem", default="6g")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(args.master)
        .appName("standalone-smoke")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.executor.cores", str(args.executor_cores))
        .config("spark.executor.memory", args.executor_mem)
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # prove we really have 2 remote executors, not local threads
    deadline = time.time() + 60
    execs = 0
    while time.time() < deadline:
        execs = (
            spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
            - 1  # minus the driver entry
        )
        if execs >= 2:
            break
        time.sleep(1)
    if execs < 2:
        print(json.dumps({"metric": "standalone_smoke",
                          "error": f"only {execs} executors joined"}))
        return 1

    import bench

    out = bench.bench_engine(spark, args.sf_dir)
    print(json.dumps({
        "metric": "standalone_smoke",
        "master": "standalone-2x" + str(args.executor_cores),
        "executors": execs,
        "queries": out,
        "sf": args.sf_dir.rstrip("/").split("sf")[-1],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
