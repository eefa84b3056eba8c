"""Drift A/B (VERDICT r6 #6, generalized for r7 #6): is a
round-over-round per-query drift a real plan regression, or a
session-position effect (JVM warmup / registry growth)?  Measure each
target FRESH (first queries in the JVM) then LATE (after 40 other
registry queries ran in the same session), same code, same sf0.1 data.

    python tools/drift_ab.py [query ...]   # default: the r6 movers

A real regression shows up in BOTH positions; a warmup artifact shows
late <= fresh (JIT-compiled, code cache hot).  Pair with
tools/bench_drift.py, which finds the movers to feed in here."""
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
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
import importlib.util

spec = importlib.util.spec_from_file_location("bench_mod", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
from ong_tsdb_spark import entry_queries

reg = entry_queries.queries()
sf = "/root/testdata/sf0.1"
TARGETS = sys.argv[1:] or ["ts_cumulative_sum_chunked", "corpus_pack_stats"]
unknown = [n for n in TARGETS if n not in reg]
if unknown:
    raise SystemExit(f"not in registry: {unknown}")


def timed(name, runs=3):
    fn = reg[name]
    fn(spark, sf).count()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).count()
        best = min(best, time.perf_counter() - t0)
    bench.release_blocks(spark)
    return best


fresh = {n: timed(n) for n in TARGETS}
print("fresh:", {k: round(v, 3) for k, v in fresh.items()}, flush=True)

# age the session: run 40 other registry queries once each
others = [n for n in bench.HEADLINE if n not in TARGETS][:40]
t0 = time.perf_counter()
for n in others:
    reg[n](spark, sf).count()
    bench.release_blocks(spark)
print(f"aged session with {len(others)} queries in "
      f"{time.perf_counter() - t0:.0f}s", flush=True)

late = {n: timed(n) for n in TARGETS}
print("late:", {k: round(v, 3) for k, v in late.items()}, flush=True)
for n in TARGETS:
    print(f"{n}: fresh {fresh[n]:.3f}s late {late[n]:.3f}s "
          f"late/fresh {late[n] / fresh[n]:.2f}x", flush=True)
spark.stop()
