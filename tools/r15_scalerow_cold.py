#!/usr/bin/env python
"""ONE cold single-shot lap of the bench's engine_ingest_100x row
(VERDICT r14 #2 scaling-signal row), isolated so the 8-vs-32-core
ratio can be measured with N fresh-process laps per side instead of
one sample per bench lap:

    SPARK_GRAFT_CPUS=32 python tools/r15_scalerow_cold.py
    SPARK_GRAFT_CPUS=8  python tools/r15_scalerow_cold.py

Replicates the sf events ticks exactly as bench.bench_engine does
(100x crossJoin, pre-materialized localCheckpoint off the clock) and
times the same snap + last-wins upsert write, single shot, fresh
store.  Prints one JSON line {"cpus": n, "n100": rows, "ingest100x": s}.
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
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r15-scalerow-cold")
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
        eng.create_sensor("bench", "events_1s_100x", "1s", ["value"])
        ev = entry_queries.load(spark, sf_dir, "events")
        ticks = ev.select(
            (epoch_us(ev, "ts") / F.lit(1e6)).alias("ts_sec"),
            F.col("value").cast("double").alias("value"),
        )
        ticks100 = (
            ticks.crossJoin(spark.range(repl))
            .select("ts_sec", "value")
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        n100 = ticks100.count()
        t0 = time.perf_counter()
        eng.write_spark_df("bench", "events_1s_100x", ticks100)
        dt = time.perf_counter() - t0
        print(json.dumps({"cpus": int(cpus), "repl": repl,
                          "n100": n100, "ingest100x": round(dt, 4)}))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
