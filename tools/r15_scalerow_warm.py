#!/usr/bin/env python
"""Warm steady-state laps of the bench's engine_ingest_100x row: one
session per invocation (like the bench lap, which runs the row after
the engine micro-rows warmed codegen + the writer path), then N
fresh-sensor writes of the SAME pre-materialized 100x tick table.

    SPARK_GRAFT_CPUS=32 python tools/r15_scalerow_warm.py
    SPARK_GRAFT_CPUS=8  python tools/r15_scalerow_warm.py

Prints one JSON line {"cpus": n, "laps": [s, ...]}.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repl = int(os.environ.get("SCALEROW_REPL", "100"))
    n_laps = int(os.environ.get("SCALEROW_LAPS", "5"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r15-scalerow-warm")
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
    from ong_tsdb_spark import OngTsdbSpark, entry_queries
    from ong_tsdb_spark.functions.timeseries import epoch_us

    base = tempfile.mkdtemp(prefix="scalerow_tsdb_")
    try:
        eng = OngTsdbSpark(spark, base)
        eng.create_db("bench")
        ev = entry_queries.load(spark, sf_dir, "events")
        ticks = ev.select(
            (epoch_us(ev, "ts") / F.lit(1e6)).alias("ts_sec"),
            F.col("value").cast("double").alias("value"),
        )
        # warm the write path the way the bench lap does (engine_ingest)
        eng.create_sensor("bench", "warmup", "1s", ["value"])
        eng.write_spark_df("bench", "warmup", ticks)
        ticks100 = (
            ticks.crossJoin(spark.range(repl))
            .select("ts_sec", "value")
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        ticks100.count()
        laps = []
        for i in range(n_laps):
            name = f"events_1s_100x_{i}"
            eng.create_sensor("bench", name, "1s", ["value"])
            t0 = time.perf_counter()
            eng.write_spark_df("bench", name, ticks100)
            laps.append(round(time.perf_counter() - t0, 4))
        print(json.dumps({"cpus": int(cpus), "repl": repl, "laps": laps}))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
