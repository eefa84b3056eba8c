#!/usr/bin/env python
"""BPE trainer scale row (VERDICT r6 #5): >=1k merges through the
n-gram-summary cascade, with an identity check against the sequential
reference loop.

The sf* documents corpus has a deliberately tiny word vocabulary
(31 distinct words at sf0.1), which exhausts greedy BPE after a few
hundred merges — so this script derives a richer symbol space from the
SAME testdata: each adjacent word n-gram becomes one training token
("alpha_beta", ``--order`` words wide).  Measured exhaustion points at
sf0.1: order=2 -> 1062 merges; order=3 -> >5k merges.

    python tools/bpe_scale.py [n_merges] [--check-sequential] [--g N]
        [--order N] [--batch N] [--natural]

``--natural`` trains on the documents table's RAW text
(character-initialized words, exactly the production tokenizer path)
instead of the synthetic n-gram symbol space — the corpus word
vocabulary bounds the learnable merge count, so this run documents the
MEASURED exhaustion point and the acceptance curve on the way there
(VERDICT r8 #3).

Prints one JSON line: {"n_merges", "rounds_cascade", "sec_cascade",
"reduction" (vs one-job-pair-per-merge), "identical" (when checked),
"curve" (accepted merges per round, bucketed into eighths of the run
so the line stays short), "fallback_rounds" (cascade rounds that
proved nothing and fell back to a single-merge recount)}.  ``--g N``
overrides the cascade's n-gram horizon (G-sensitivity row,
VERDICT r7 #3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def bigram_token_corpus(spark, sf_dir: str, order: int = 2):
    """Adjacent word n-grams as training tokens (default bigrams —
    ~31^2 distinct symbols at sf0.1, exhausting greedy BPE at ~1.1k
    merges; ``order=3`` gives ~31^3 and a >5k-merge space)."""
    from ong_tsdb_spark import entry_queries

    docs = entry_queries.load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))

    def gram(i):
        parts = [F.element_at(words, (i + F.lit(k)).cast("int")) for k in range(order)]
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, F.lit("_"), p)
        return out

    grams = F.when(
        F.size(words) >= order,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (order - 1)), gram
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col("doc_id"), F.array_join(grams, " ").alias("text")
    )


def _curve_eighths(history: list[int]) -> list[float]:
    """Mean accepted-per-round over (up to) eight contiguous slices of
    the round sequence — a compact acceptance-rate-vs-round curve.
    Numpy-style ceil/floor boundaries cover EVERY round (ADVICE r8:
    the old len//8 truncation dropped up to 7+k tail rounds — exactly
    where cascade acceptance decays)."""
    if not history:
        return []
    n = len(history)
    parts = min(8, n)
    bounds = [round(i * n / parts) for i in range(parts + 1)]
    return [
        round(sum(history[lo:hi]) / (hi - lo), 1)
        for lo, hi in zip(bounds, bounds[1:])
    ]


def main() -> int:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    check = "--check-sequential" in sys.argv
    g = None
    if "--g" in sys.argv:
        g = int(sys.argv[sys.argv.index("--g") + 1])
    order = 2
    if "--order" in sys.argv:
        order = int(sys.argv[sys.argv.index("--order") + 1])
    natural = "--natural" in sys.argv
    batch = 64
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bpe-scale")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # Runs at Spark's DEFAULT 1 GiB driver heap unless overridden: the
    # trainer's memory contract (DISK_ONLY round checkpoints, rotated
    # blocks, capped driver state — train_bpe_merges docstring) is what
    # the 12M-token scale row exists to prove, so this tool must not
    # paper over a regression with a bigger heap.  The r11 run needed
    # SPARK_GRAFT_DRIVER_MEM=16g before that contract landed.
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"]
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from ong_tsdb_spark.plans import bpe

    from pyspark.storagelevel import StorageLevel

    # DISK_ONLY like the trainer's own round checkpoints: the input
    # corpus must not squat in the (local-mode shared) heap's protected
    # storage region while the pair-count aggregates run
    if natural:
        from ong_tsdb_spark import entry_queries

        corpus = entry_queries.load(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    else:
        corpus = bigram_token_corpus(spark, sf_dir, order).localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
    t0 = time.perf_counter()
    cascade = bpe.train_bpe_merges(
        corpus, n_merges=n_merges, batch=batch, cascade_g=g
    )
    sec = round(time.perf_counter() - t0, 2)
    rounds = bpe.LAST_TRAIN_ROUNDS
    history = list(bpe.LAST_TRAIN_HISTORY)
    out = {
        "n_merges": len(cascade),
        "rounds_cascade": rounds,
        "sec_cascade": sec,
        "reduction": round(len(cascade) / max(rounds, 1), 1),
        "curve": _curve_eighths(history),
        # a fallback is a 0-accepted cascade round FOLLOWED by another
        # round (the single-merge recount it triggered); a TRAILING 0
        # is the terminal empty probe (exhaustion / empty batch), not a
        # fallback — train_bpe_merges records it since round 9 so
        # len(history) == rounds on every exit path
        "fallback_rounds": sum(1 for x in history[:-1] if x == 0),
        # driver-memory contract telemetry: max rows the driver
        # collected in any round (bounded by (G-1)*topK + symbol
        # universe, corpus-independent) and the simulation memo peak
        # (hard-capped at CASCADE_MEMO_CAP)
        "driver_rows_max": max(bpe.LAST_DRIVER_ROWS, default=0),
        "memo_peak": bpe.LAST_MEMO_PEAK,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default(1g)"),
        "g": g or bpe.CASCADE_G,
        "natural": natural,
        "order": None if natural else order,
        "batch": batch,
        "sf": sf_dir,
    }
    print(f"[bpe-scale] cascade: {len(cascade)} merges in {rounds} rounds "
          f"({sec}s, G={out['g']}); accepted/round curve {out['curve']}, "
          f"{out['fallback_rounds']} fallback rounds", file=sys.stderr)
    if check:
        t0 = time.perf_counter()
        seq = bpe.train_bpe_merges(
            corpus, n_merges=n_merges, batch=1, guard="exact"
        )
        out["sec_sequential"] = round(time.perf_counter() - t0, 2)
        out["rounds_sequential"] = bpe.LAST_TRAIN_ROUNDS
        out["identical"] = cascade == seq
        print(f"[bpe-scale] sequential: {len(seq)} merges in "
              f"{bpe.LAST_TRAIN_ROUNDS} rounds ({out['sec_sequential']}s) "
              f"identical={out['identical']}", file=sys.stderr)
        assert out["identical"], "cascade diverged from sequential at scale"
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
