"""Speculative-execution twin of the retry-determinism axis (r14).

``spark.speculation`` is a cluster-routine setting (stragglers on a
busy fleet get raced by a second attempt of the SAME task); an
operator whose output depends on which attempt wins — attempt-scoped
RNG, wall clock, partial side effects — breaks exactness silently.
This child runs under its own JVM (speculation is read at scheduler
startup, so the shared fixture session cannot flip it) with an
aggressive speculation profile, makes partition 0's FIRST attempt a
deliberate straggler (sleep, no failure — nothing retries, the racer
just wins), and proves two mapInPandas operators produce output
bit-identical to a no-straggler run.  A marker file written by any
attemptNumber>0 task proves a speculative copy actually ran.
"""
import os
import sys
import time
import uuid

sys.path.insert(0, sys.argv[1])  # repo root
SF_DIR = sys.argv[2]
MARK_DIR = sys.argv[3]
MASTER = sys.argv[4]  # spark://host:port — speculation NEVER runs on
# a local[] backend (the speculation scheduler starts only when
# !isLocal), so this child requires the standalone topology the test
# harness brings up

from pyspark import TaskContext
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(MASTER)
    .appName("speculation-determinism")
    .config("spark.speculation", "true")
    .config("spark.speculation.interval", "100ms")
    .config("spark.speculation.quantile", "0.25")
    .config("spark.speculation.multiplier", "1.2")
    # efficiency-aware speculation (3.4+) gates on data-process rate;
    # irrelevant to the determinism property under test and one more
    # trigger to go flaky — plain duration-based speculation is the bar
    .config("spark.speculation.efficiency.enabled", "false")
    .config("spark.driver.host", "127.0.0.1")
    .config("spark.executor.cores", "4")
    .config("spark.executor.memory", "2g")
    .config("spark.executorEnv.PYTHONPATH", sys.argv[1])
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from ong_tsdb_spark.operators import multimodal
from ong_tsdb_spark.plans import tokenized_shards as tsh


def straggler(slow: bool):
    """Passthrough; when armed, partition 0 attempt 0 sleeps AFTER
    yielding its batches (a tail straggler — the common preemption /
    IO-stall shape), so the speculative copy overtakes it mid-flight.
    Any attempt > 0 drops a marker proving speculation launched."""

    def fn(batches):
        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() > 0:
            with open(os.path.join(MARK_DIR,
                                   f"spec-{uuid.uuid4().hex}"), "w"):
                pass
        for pdf in batches:
            yield pdf
        if (
            slow
            and ctx is not None
            and ctx.partitionId() == 0
            and ctx.attemptNumber() == 0
        ):
            time.sleep(8)

    return fn


def staged(df, slow: bool):
    rep = df.repartition(8)
    return rep.mapInPandas(straggler(slow), rep.schema)


def n_marks():
    return len(os.listdir(MARK_DIR))


docs = (
    spark.read.parquet(f"{SF_DIR}/documents.parquet")
    .select("doc_id", "text", "source")
    .where("doc_id < 400")
)

# ---------------------------------------------------------------- pack
def run_pack(slow: bool):
    seqs = tsh.pack_sequences(staged(docs, slow), vocab_size=200, seq_len=64)
    return [
        (r["seq_id"], tuple(r["ids"]), r["n_real_tokens"], r["n_docs"])
        for r in seqs.orderBy("seq_id").collect()
    ]


clean_pack = run_pack(False)
base = n_marks()
slow_pack = run_pack(True)
spec_fired_pack = n_marks() - base
assert clean_pack == slow_pack, "pack_sequences NOT speculation-stable"
assert len(clean_pack) > 1
print(f"pack_sequences speculation-stable over {len(clean_pack)} "
      f"sequences, {spec_fired_pack} speculative attempts", flush=True)

# ------------------------------------------------------------ features
media = multimodal.fake_media_table(docs)


def run_feat(slow: bool):
    feats = multimodal.extract_features(staged(media, slow), decoders="stub")
    return sorted(tuple(r) for r in feats.collect())


clean_f = run_feat(False)
base = n_marks()
slow_f = run_feat(True)
spec_fired_feat = n_marks() - base
assert clean_f == slow_f, "extract_features NOT speculation-stable"
assert len(clean_f) > 1
print(f"extract_features speculation-stable over {len(clean_f)} rows, "
      f"{spec_fired_feat} speculative attempts", flush=True)

# the proof that the axis is live: at least one speculative attempt
# must actually have raced across the two slow runs combined
assert spec_fired_pack + spec_fired_feat > 0, (
    "no speculative attempt ever launched — the straggler profile "
    "did not trigger speculation in this Spark version/mode"
)
print("SPECULATION-DETERMINISM OK")
