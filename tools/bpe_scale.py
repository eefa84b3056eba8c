#!/usr/bin/env python
"""BPE trainer scale row (VERDICT r6 #5): >=1k merges through the
n-gram-summary cascade, with an identity check against the sequential
reference loop.

The sf* documents corpus has a deliberately tiny word vocabulary
(31 distinct words at sf0.1), which exhausts greedy BPE after a few
hundred merges — so this script derives a richer symbol space from the
SAME testdata: each adjacent word PAIR becomes one training token
("alpha_beta"), giving ~31^2 distinct tokens and >10k learnable
merges while keeping corpus-scale counts real.

    python tools/bpe_scale.py [n_merges] [--check-sequential]

Prints one JSON line: {"n_merges", "rounds_cascade", "sec_cascade",
"reduction" (vs one-job-pair-per-merge), "identical" (when checked)}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def bigram_token_corpus(spark, sf_dir: str):
    from ong_tsdb_spark import entry_queries

    docs = entry_queries.load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat(
                F.element_at(words, i.cast("int")),
                F.lit("_"),
                F.element_at(words, (i + F.lit(1)).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col("doc_id"), F.array_join(bigrams, " ").alias("text")
    )


def main() -> int:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    check = "--check-sequential" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bpe-scale")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ong_tsdb_spark.plans import bpe

    corpus = bigram_token_corpus(spark, sf_dir).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    cascade = bpe.train_bpe_merges(corpus, n_merges=n_merges, batch=64)
    sec = round(time.perf_counter() - t0, 2)
    rounds = bpe.LAST_TRAIN_ROUNDS
    out = {
        "n_merges": len(cascade),
        "rounds_cascade": rounds,
        "sec_cascade": sec,
        "reduction": round(len(cascade) / max(rounds, 1), 1),
        "sf": sf_dir,
    }
    print(f"[bpe-scale] cascade: {len(cascade)} merges in {rounds} rounds "
          f"({sec}s)", file=sys.stderr)
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
