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
        [--subset-size 29] [--no-update-coverage]

Exit code 0 iff every query matches its DuckDB oracle exactly (same
canonicalization as tools/replay.py).

Subset policy (VERDICT r7 #4 — staleness-rotated, like the driver
window): a small PINNED set keeps one query per execution shape in
every run (engine scan, Arrow mapInPandas, iterative jobs, streaming
replay, pipeline); the rest of the subset is the least-recently-
cluster-checked registry entries per ``tools/cluster_coverage.json``
(never-checked first, ties in registry order).  Entries that pass are
stamped with the run index in that ledger (committed to git), so every
registry entry gets a multi-JVM proof on a bounded cadence —
~(|registry| - |pinned|) / (subset - |pinned|) runs for full coverage.
``--only`` bypasses the rotation and never updates the ledger.

NOTE: shutdown of local-cluster workers logs noisy (benign) RPC errors
after results are printed — the exit code is the signal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# local-cluster workers need SPARK_HOME to launch executor JVMs
import pyspark  # noqa: E402

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))

from ong_tsdb_spark.compare import TABLES, canon_rows  # noqa: E402

COVERAGE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "cluster_coverage.json")

#: always-run execution-shape anchors — one per distribution-sensitive
#: mechanism, so a closure-serialization or Python-worker regression in
#: any mechanism is caught in EVERY run, not once per rotation cycle
PINNED_SHAPES = [
    "ts_range_read",            # pruned engine scan + dtype-adaptive time
    "dedup_minhash_lsh",        # explode + wide min-agg + band join
    "emb_pq_adc_topk",          # Arrow mapInPandas training + ADC
    "multimodal_features",      # binary columns through mapInPandas
    "graph_pagerank",           # iterative integer joins + localCheckpoint
    "dedup_ledger_crash_replay",  # real streaming + checkpoint loss
    "corpus_pack_sequences",    # tokenize -> id-map -> pack pipeline
]


def load_coverage() -> dict:
    try:
        with open(COVERAGE_PATH) as f:
            return json.load(f)
    except Exception:
        return {"runs": 0, "checked": {}}


def pick_subset(names: list[str], size: int) -> list[str]:
    """Pinned anchors + the least-recently-cluster-checked entries."""
    checked = load_coverage().get("checked", {})
    order = {n: i for i, n in enumerate(names)}
    pinned = [n for n in PINNED_SHAPES if n in order]
    ranked = sorted(
        (n for n in names if n not in set(pinned)),
        key=lambda n: (checked.get(n, 0), order[n]),
    )
    return pinned + ranked[: max(0, size - len(pinned))]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--mem-mb", type=int, default=2048)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--subset-size", type=int, default=29)
    ap.add_argument("--no-update-coverage", action="store_true")
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
        names = pick_subset(list(qs), args.subset_size)
        for missing in (n for n in PINNED_SHAPES if n not in qs):
            # a registry change removed a shape anchor — the per-shape
            # guarantee no longer holds; say so, don't shrink silently
            print(f"SKIPPED (pinned anchor not in registry): {missing}",
                  flush=True)
    bad = []
    passed = []
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
        if ok:
            passed.append(name)
        else:
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
    if passed and not args.only and not args.no_update_coverage:
        cov = load_coverage()
        cov["runs"] = int(cov.get("runs", 0)) + 1
        cov.setdefault("checked", {})
        for n in passed:
            cov["checked"][n] = cov["runs"]
        with open(COVERAGE_PATH, "w") as f:
            json.dump(cov, f, indent=1, sort_keys=True)
            f.write("\n")
        done = sum(1 for n in qs if n in cov["checked"])
        print(f"coverage ledger: run {cov['runs']}, cumulative "
              f"{done}/{len(qs)} registry entries cluster-proven "
              f"({COVERAGE_PATH})")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
