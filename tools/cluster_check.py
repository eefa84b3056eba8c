#!/usr/bin/env python
"""Multi-JVM validation: replay a representative slice of the registry
under Spark's ``local-cluster[W,C,M]`` master — SEPARATE executor JVMs
with real closure serialization, Python worker launch, and
network-transported shuffles, unlike ``local[*]`` where everything
shares the driver JVM.  This is the strongest distribution check
available without a real cluster (ROADMAP #29): it catches
driver-only-sys.path bugs, unserializable closures, and
single-JVM-only state sharing that local-mode tests mask.

    python tools/cluster_check.py [--sf-dir /root/testdata/sf0.01]
        [--workers 2] [--cores 4] [--mem-mb 2048] [--only NAME ...]

Exit code 0 iff every query matches its DuckDB oracle exactly (same
canonicalization as tools/replay.py).  Default subset: one query per
operator family, chosen to cover every execution shape — engine scan,
window, joins, explode+agg dedup, Arrow mapInPandas (PQ/IVF training,
multimodal), iterative jobs (connected components), driver-literal
models (classifier/DSIR), and streaming-adjacent pack pipelines.

NOTE: shutdown of local-cluster workers logs noisy (benign) RPC errors
after results are printed — the exit code is the signal.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# local-cluster workers need SPARK_HOME to launch executor JVMs
import pyspark  # noqa: E402

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))

from ong_tsdb_spark.compare import TABLES, canon_rows  # noqa: E402

#: one query per execution shape (see module docstring)
DEFAULT_SUBSET = [
    "ts_range_read",          # pruned scan + dtype-adaptive time
    "ts_rolling_mean",        # chunk-parallel windows
    "tpch_q3_topk",           # broadcast joins + TakeOrdered
    "dedup_minhash_lsh",      # explode + wide min-agg + band join
    "dedup_clusters",         # iterative jobs + localCheckpoint
    "text_classifier_quality",  # plan-literal model, map-side
    "corpus_dsir_weights",    # driver-collected counts -> literals
    "text_bpe_pairs",         # substring generate + count agg
    "doc_chunk_stats",        # generate + slice fan-out
    "emb_pq_adc_topk",        # Arrow mapInPandas training + ADC
    "emb_ivf_topk",           # integer-exact k-means + probe
    "events_funnel",          # min-agg + user-keyed join chain
    "corpus_pack_sequences",  # tokenize -> id-map -> pack pipeline
    "multimodal_features",    # binary columns through mapInPandas
    # round-6 shapes
    "graph_pagerank",         # iterative integer joins + localCheckpoint
    "events_interval_join",   # chunk-bucketed bin join (explode+equi)
    "dedup_ledger_replay",    # cross-batch parquet ledger handoff
    # r6->r7 rotation holdovers (with ts_range_read/ts_rolling_mean
    # above, ALL eight entries that skip the r6 driver window get a
    # value-checked multi-JVM replay this round instead)
    "ts_snap_grid",
    "tpch_q1",
    "tpch_q6",
    "ts_delta",
    "text_contamination",
    "text_vocab",
    # round-6 registrations exercised under multi-JVM
    "dedup_near_ledger_replay",
    "corpus_topic_sample",
    # round-7 shapes: crash-recovery streaming replay, join-free
    # retention, common-set-subtract novelty (reworked this round)
    "dedup_ledger_crash_replay",
    "events_retention",
    "text_bigram_novelty",
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--mem-mb", type=int, default=2048)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args(argv)

    import duckdb
    from pyspark.sql import SparkSession

    master = f"local-cluster[{args.workers},{args.cores},{args.mem_mb}]"
    spark = (
        SparkSession.builder.master(master)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(args.workers * args.cores))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_exec = spark.sparkContext.defaultParallelism
    print(f"master={master} defaultParallelism={n_exec}", flush=True)

    import __spark_entry__ as entry_mod

    # pin the oracle environment in every transcript: a hash-only
    # driver mismatch that no local replay reproduces (r5
    # emb_centroid_dist) is most plausibly an engine-version skew
    print(f"duckdb={duckdb.__version__}", flush=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if args.only:
        names = args.only
    else:
        names = [n for n in DEFAULT_SUBSET if n in qs]
        for missing in (n for n in DEFAULT_SUBSET if n not in qs):
            # a registry rotation removed a shape-covering query — the
            # per-shape guarantee no longer holds; say so, don't shrink
            # the sweep silently
            print(f"SKIPPED (not in registry): {missing}", flush=True)
    bad = []
    for i, name in enumerate(names):
        t0 = time.time()
        err = None
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols, srows_raw = sdf.columns, sdf.collect()
            rel = con.sql(oracles[name])
            # same contract as tools/replay.py: the NAMES must match
            # too, not just the name-sorted value tuples
            sc = canon_rows(scols, srows_raw)
            oc = canon_rows(rel.columns, rel.fetchall())
            ok = sorted(scols) == sorted(rel.columns) and sc == oc
            if not ok:
                # self-diagnosing mismatch: dump the first differing
                # canonical rows from each side (with value TYPES — a
                # 123 vs 123.0 width drift is invisible in plain repr)
                if sorted(scols) != sorted(rel.columns):
                    print(f"    COLS spark={sorted(scols)} oracle={sorted(rel.columns)}",
                          flush=True)
                # hoist the membership sets (keyed by repr: rows can
                # hold unhashable list columns) — building them per
                # row would be quadratic over ~10k-row results
                oc_set = set(map(repr, oc))
                sc_set = set(map(repr, sc))
                only_s = [r for r in sc if repr(r) not in oc_set][:5]
                only_o = [r for r in oc if repr(r) not in sc_set][:5]
                for side, rows in (("spark-only", only_s), ("oracle-only", only_o)):
                    for r in rows:
                        typed = tuple(f"{v!r}:{type(v).__name__}" for v in r)
                        print(f"    DIFF {side}: {typed}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            ok, err = False, f"{type(ex).__name__}: {str(ex)[:300]}"
        status = "OK" if ok else "MISMATCH"
        if not ok:
            bad.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)",
              flush=True)
        if err:
            print(f"    ERROR {err}", flush=True)
    # engine write path under multi-JVM: full snap -> last-wins ->
    # cellwise merge -> dynamic-overwrite round trip, then an upsert
    # of one cell (the reference's core semantics)
    t0 = time.time()
    try:
        import tempfile

        import numpy as np
        import pandas as pd

        from ong_tsdb_spark import OngTsdbSpark

        eng = OngTsdbSpark(spark, tempfile.mkdtemp(prefix="cluster_check_"))
        eng.create_db("d")
        eng.create_sensor("d", "s", "1s", ["a", "b"])
        idx = pd.date_range("2024-01-01", periods=5000, freq="10s", tz="UTC")
        df = pd.DataFrame(
            {"a": np.arange(5000.0), "b": np.arange(5000.0) * 2}, index=idx
        )
        eng.write_df("d", "s", df)
        back = eng.read_pandas("d", "s", idx[0].timestamp(), idx[-1].timestamp())
        ok = (
            len(back) == 5000
            and float(back["a"].iloc[42]) == 42.0
            and float(back["b"].iloc[42]) == 84.0
        )
        # upsert at row 42, where the preserved column's value (84.0)
        # differs from the fill value AND from zero — an overwrite,
        # null-out, or dropped merge all change it, so the assertion
        # actually proves the cellwise merge (row 0's b == 0.0 would
        # be vacuous: it equals the fill default)
        eng.write_df("d", "s", pd.DataFrame({"a": [123.0]}, index=idx[42:43]))
        back2 = eng.read_pandas("d", "s", idx[42].timestamp(), idx[42].timestamp())
        ok = ok and float(back2["a"].iloc[0]) == 123.0 and float(back2["b"].iloc[0]) == 84.0
    except Exception as ex:  # noqa: BLE001
        ok = False
        print(f"engine round-trip EXC: {ex}", flush=True)
    if not ok:
        bad.append("engine_roundtrip")
    print(f"[engine] write/upsert/read round-trip: "
          f"{'OK' if ok else 'MISMATCH'} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\nRESULT: {len(names) + 1 - len(bad)}/{len(names) + 1} exact under "
          f"{master}; failures: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
