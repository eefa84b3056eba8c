"""Child process for tests/test_retry_determinism.py (VERDICT r13 #5).

Runs under ``local[4, 3]`` (task retries ON — the default test session
``local[N]`` fails the job on first task failure, so this cannot run in
the shared fixture JVM).  Injects a mid-task failure on attempt 0 of
chosen partitions via TaskContext, then proves the mapInPandas
operators produce BIT-IDENTICAL output with and without the injected
retries:

* a retried task re-emits exactly what attempt 0 would have (partial
  attempt-0 output is discarded by Spark — shuffle map output on
  failure, result-task output on non-delivery);
* nothing in the operators (pack_sequences' prefix-sum packing,
  extract_features' per-batch generator) depends on attempt-scoped
  state (RNG, wall clock, accumulation across batches that a replay
  would double-count).

At cluster scale task retries are ROUTINE (preemption, spot kills,
fetch failures) — a nondeterministic partition on retry silently
breaks exactness guarantees, which is exactly what the driver's
oracle-hash gate would then flag intermittently.
"""
import sys

sys.path.insert(0, sys.argv[1])  # repo root
SF_DIR = sys.argv[2]
MARK_DIR = sys.argv[3]  # injection side-channel: accumulator updates
# from FAILED tasks are discarded by Spark, so the proof that the
# injection fired is a marker file written just before the raise

from pyspark import TaskContext
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4, 3]")
    .appName("retry-determinism")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from ong_tsdb_spark.operators import multimodal
from ong_tsdb_spark.plans import tokenized_shards as tsh

import os
import uuid


def _mark():
    with open(os.path.join(MARK_DIR, f"inj-{uuid.uuid4().hex}"), "w"):
        pass


def _n_marks():
    return len(os.listdir(MARK_DIR))


def passthrough(fail_attempt0: bool):
    """mapInPandas passthrough; when armed, partitions 0 and 1 yield
    their first batch then die on attempt 0 — a MID-TASK failure, so
    the retry must reproduce the already-partially-emitted stream."""

    def fn(batches):
        ctx = TaskContext.get()
        arm = (
            fail_attempt0
            and ctx is not None
            and ctx.partitionId() in (0, 1)
            and ctx.attemptNumber() == 0
        )
        emitted = False
        for pdf in batches:
            yield pdf
            if arm and not emitted:
                emitted = True
                _mark()
                raise RuntimeError(
                    "injected attempt-0 failure after partial emit"
                )
        if arm and not emitted:
            _mark()
            raise RuntimeError("injected attempt-0 failure (empty part)")

    return fn


def poisoned(df, fail: bool):
    # repartition first so the poison stage has 4 deterministic
    # post-shuffle partitions regardless of parquet file layout
    rep = df.repartition(4)
    return rep.mapInPandas(passthrough(fail), rep.schema)


# a deterministic subset by id (never limit(): its row pick is
# plan-order-dependent and would confound the retry comparison)
docs = (
    spark.read.parquet(f"{SF_DIR}/documents.parquet")
    .select("doc_id", "text", "source")
    .where("doc_id < 400")
)

# ---------------------------------------------------------------- pack
def run_pack(fail: bool):
    seqs = tsh.pack_sequences(
        poisoned(docs, fail), vocab_size=200, seq_len=64
    )
    return [
        (r["seq_id"], tuple(r["ids"]), r["n_real_tokens"], r["n_docs"])
        for r in seqs.orderBy("seq_id").collect()
    ]


base = _n_marks()
clean_pack = run_pack(False)
assert _n_marks() == base, "clean run must not inject"
hurt_pack = run_pack(True)
n_inj = _n_marks() - base
assert n_inj > 0, "injection never fired for pack"
assert clean_pack == hurt_pack, "pack_sequences NOT retry-stable"
assert len(clean_pack) > 1
print(f"pack_sequences retry-stable over {len(clean_pack)} sequences, "
      f"{n_inj} injected failures", flush=True)

# ------------------------------------------------------------ features
media = multimodal.fake_media_table(docs)


def run_feat(fail: bool):
    feats = multimodal.extract_features(poisoned(media, fail), decoders="stub")
    return sorted(tuple(r) for r in feats.collect())


base = _n_marks()
clean_f = run_feat(False)
hurt_f = run_feat(True)
n_inj = _n_marks() - base
assert n_inj > 0, "injection never fired for features"
assert clean_f == hurt_f, "extract_features NOT retry-stable"
assert len(clean_f) > 1
print(f"extract_features retry-stable over {len(clean_f)} rows, "
      f"{n_inj} injected failures", flush=True)


# ------------------------------------------------- streaming ledger
# The foreachBatch ledger protocol under TASK-level retry (pulled
# forward from the r15 candidate list): poison the micro-batch input
# so its tasks die on attempt 0 INSIDE the batch function's jobs —
# distinct from the crash-replay tests, which exercise BATCH-level
# replay after a query restart.  The committed output and the ledger
# digest set must be bit-identical to a clean run.
import json
import shutil
import tempfile

from ong_tsdb_spark.sources.jsonl import DOCUMENTS_SCHEMA
from ong_tsdb_spark.streaming import dedup as sd


def run_ledger(fail: bool):
    base = tempfile.mkdtemp(prefix="retry_ledger_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    rows = [
        {"doc_id": i, "text": f"document text {i % 7}", "lang": "en",
         "source": "s", "n_chars": 15}
        for i in range(60)
    ]
    # two source files -> two micro-batches (maxFilesPerTrigger=1)
    for f, chunk in (("a.json", rows[:30]), ("b.json", rows[30:])):
        with open(os.path.join(src, f), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1").json(src)
    )
    poisoned_stream = stream.repartition(4).mapInPandas(
        passthrough(fail), stream.schema
    )
    ledger = os.path.join(base, "ledger")
    out = os.path.join(base, "out")
    q = sd.start_ledger_dedup(
        spark, poisoned_stream, ledger, out, os.path.join(base, "ckpt")
    )
    q.awaitTermination(300)
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    )
    digests = sorted(
        r[0] for r in spark.read.parquet(ledger)
        .select(sd.FINGERPRINT_COL).distinct().collect()
    )
    shutil.rmtree(base, ignore_errors=True)
    return docs, digests


base = _n_marks()
clean_led = run_ledger(False)
hurt_led = run_ledger(True)
n_inj = _n_marks() - base
assert n_inj > 0, "injection never fired for ledger"
assert clean_led == hurt_led, "ledger dedup NOT retry-stable"
assert len(clean_led[0]) == 7 and len(clean_led[1]) == 7, clean_led
print(f"ledger_dedup retry-stable over {len(clean_led[0])} docs / "
      f"{len(clean_led[1])} digests, {n_inj} injected failures", flush=True)

print("RETRY-DETERMINISM OK")
