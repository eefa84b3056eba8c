#!/usr/bin/env python
"""ONE cold single-shot engine lap (VERDICT r14 #1): fresh JVM, fresh
store, ingest the sf events ticks, then ONE timed 10%-slice upsert —
exactly the shape the driver's bench measures (bench.bench_engine),
isolated so the write-width candidates can be A/B'd across code
states with N fresh-process laps per side.

    python tools/r15_engine_cold.py            # sf0.1 shape
    python tools/r15_engine_cold.py --ticks10m # the 10M-tick shape
                                               # (needs /tmp/sf_scale100)

Prints one JSON line {"ingest": s, "upsert": s, "n": rows}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    big = "--ticks10m" in sys.argv
    sf_dir = (
        "/tmp/sf_scale100"
        if big
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r15-engine-cold")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ong_tsdb_spark import OngTsdbSpark, entry_queries
    from ong_tsdb_spark.functions.timeseries import epoch_us

    ev = entry_queries.load(spark, sf_dir, "events")
    ticks = ev.select(
        (epoch_us(ev, "ts") / F.lit(1e6)).alias("ts_sec"),
        F.col("value").cast("double").alias("value"),
    )
    base = tempfile.mkdtemp(prefix="r15_cold_")
    try:
        eng = OngTsdbSpark(spark, base)
        eng.create_db("bench")
        eng.create_sensor("bench", "events_1s", "1s", ["value"])
        n = ticks.count()
        t0 = time.perf_counter()
        eng.write_spark_df("bench", "events_1s", ticks)
        ingest = time.perf_counter() - t0
        slice_df = ticks.limit(max(n // 10, 1))
        t0 = time.perf_counter()
        eng.write_spark_df("bench", "events_1s", slice_df)
        upsert = time.perf_counter() - t0
        print(json.dumps({"ingest": round(ingest, 4),
                          "upsert": round(upsert, 4), "n": n}))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
