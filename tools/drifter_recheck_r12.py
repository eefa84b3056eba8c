#!/usr/bin/env python
"""One-off quiet-host recheck of the three r10->r11 sweep drifters
(VERDICT r11 #3): dedup_ngram_jaccard (skew 1.24x -> 1.58x),
dedup_clusters (skew 1.16x -> 1.58x), text_classifier_train (10x warm
2.94x -> 5.3x) — each re-measured IN ISOLATION under the best-of-3
discard-first protocol (the stricter cluster_bench protocol): blocks
released, one discarded warm-up lap, then best of 3 per side.

Assumes the sweep corpora already exist (/tmp/sf_skew from bench.py
--skew, /tmp/sf_scale10 from bench.py --scale10).  Prints one JSON
line per family; the BENCH.md round-12 subsection records the
directional verdicts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def best_of(fn, d, runs=3):
    fn(d)  # discard-first
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(d)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("drifter-recheck")
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

    registry = entry_queries.queries()
    jobs = [
        ("dedup_ngram_jaccard", "skew", sf_dir, "/tmp/sf_skew", 1.24, 1.58),
        ("dedup_clusters", "skew", sf_dir, "/tmp/sf_skew", 1.16, 1.58),
        ("text_classifier_train", "10x", sf_dir, "/tmp/sf_scale10", 2.94, 5.3),
    ]
    for name, axis, base, other, r10, r11 in jobs:
        if not os.path.isdir(other):
            print(json.dumps({"family": name, "axis": axis,
                              "skipped": f"{other} missing"}))
            continue
        fn = registry[name]
        warms = {}
        for tag, d in (("base", base), ("other", other)):
            bench.release_blocks(spark)
            warms[tag] = best_of(lambda dd: fn(spark, dd).count(), d)
            bench.release_blocks(spark)
        ratio = round(warms["other"] / warms["base"], 2)
        # directional verdict vs the r10/r11 sweep readings, same 1.5x
        # trigger the sweeps use
        if max(ratio, r10) / max(min(ratio, r10), 1e-9) < 1.5:
            direction = "recheck-exonerated (isolated ratio back at the r10 reading; the r11 move was sweep-position/host spread)"
        elif max(ratio, r11) / max(min(ratio, r11), 1e-9) < 1.5:
            direction = "drift-real (isolated ratio confirms the r11 reading)"
        else:
            direction = "inconclusive (isolated ratio matches neither sweep)"
        print(json.dumps({
            "family": name, "axis": axis,
            "base_warm_s": round(warms["base"], 3),
            "other_warm_s": round(warms["other"], 3),
            "ratio_bo3": ratio, "r10_sweep": r10, "r11_sweep": r11,
            "direction": direction,
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
