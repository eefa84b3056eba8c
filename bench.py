#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized (count + a cheap checksum collect) so
lazy plans can't cheat.  A warmup pass primes the JVM/code-cache; the
reported time is the best of N timed runs per query (steady-state
throughput, what a long-running service sees).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from ong_tsdb_spark import entry_queries  # noqa: E402

# headline subset: one per operator family (full registry runs in tests)
HEADLINE = [
    "ts_range_read",
    "ts_snap_grid",
    "ts_downsample_first",
    "ts_upsert_last_wins",
    "tpch_q1",
    "tpch_q3_topk",
    "tpch_q5ish",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "text_langid",
    "emb_cosine_topk",
    "emb_neardup_blocked",
]

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ong_tsdb_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = entry_queries.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()  # warmup (plan + code cache + page cache)
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"[bench] {name}: warmup {warm:.2f}s best {best:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
