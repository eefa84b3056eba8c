"""Full-registry oracle replay — the repo-local twin of the driver's
correctness gate, runnable from anywhere:

    python tools/replay.py [--sf-dir /root/testdata/sf0.01] [--only NAME ...]

Runs EVERY ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, compares
column names and exact values (after sorting columns by name and rows
by repr — the same canonicalization ``tests/test_entry.py`` pins), and
prints one line per entry plus a final tally.  Exit code 0 iff every
entry is exact.

Unlike the pytest harness this uses a DEFAULT SparkSession (no
timezone pin, default shuffle partitions) — the configuration the
driver itself runs, which has caught executor-sys.path and
session-default bugs the tuned test session masked."""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ong_tsdb_spark.compare import TABLES, canon_rows as _rows_canon  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--only", nargs="*", default=None, help="subset of entry names")
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="hostile session defaults: ANSI OFF (silent NaN/overflow "
        "coercions instead of errors), non-UTC timezone, prime shuffle "
        "partition count, auto-broadcast disabled — the round-6 "
        "adversarial-session sweep as a first-class flag; compose with "
        "an edge-corpus --sf-dir for data x session hostility",
    )
    ap.add_argument(
        "--lowmem",
        action="store_true",
        help="memory-pressure session (round-13 axis): 1g driver heap "
        "(= the whole local-mode JVM), spark.memory.fraction 0.2 (a "
        "~200 MB unified pool shared by all tasks — hash aggregates "
        "and sort-merge joins must SPILL), broadcast joins disabled "
        "(every join takes the shuffle path).  Proves no operator "
        "silently depends on everything fitting in executor memory — "
        "the difference between a plan that survives a 100 TB "
        "partition skew and one that OOMs.  Value-compared against "
        "the same DuckDB oracles, so spilled execution must stay "
        "bit-identical",
    )
    ap.add_argument(
        "--json-out",
        default=None,
        help="also write {entry: {status, sec}} plus a summary to this "
        "path (round artifacts, e.g. LOWMEM_rNN.json)",
    )
    args = ap.parse_args(argv)

    import duckdb
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master(args.master).config(
        "spark.ui.enabled", "false"
    )
    if args.hostile:
        builder = (
            builder.config("spark.sql.ansi.enabled", "false")
            .config("spark.sql.session.timeZone", "Australia/Eucla")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        )
    if args.lowmem:
        builder = (
            builder.config("spark.driver.memory", "1g")
            .config("spark.memory.fraction", "0.2")
            .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        )
    spark = builder.getOrCreate()
    if args.hostile:
        # getOrCreate may reuse an existing JVM session — force the
        # runtime confs so the flags hold either way
        for k, v in [
            ("spark.sql.ansi.enabled", "false"),
            ("spark.sql.session.timeZone", "Australia/Eucla"),
            ("spark.sql.shuffle.partitions", "7"),
            ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ]:
            spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # pin the oracle environment in every transcript: a hash-only
    # driver mismatch that no local replay reproduces (r5
    # emb_centroid_dist) is most plausibly an engine-version skew
    print(f"duckdb={duckdb.__version__}", flush=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = args.only or list(qs)
    bad = []
    per_entry: dict[str, dict] = {}
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols, srows = sdf.columns, sdf.collect()
            rel = con.sql(oracles[name])
            ocols, orows = rel.columns, rel.fetchall()
            ok = sorted(scols) == sorted(ocols) and _rows_canon(
                scols, srows
            ) == _rows_canon(ocols, orows)
            status = "OK" if ok else "MISMATCH"
        except Exception as e:  # pragma: no cover - diagnostic path
            status = f"ERROR {type(e).__name__}: {e}"[:160]
        if status != "OK":
            bad.append(name)
        sec = round(time.time() - t0, 1)
        per_entry[name] = {"status": status, "sec": sec}
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({sec}s)",
              flush=True)
    print(f"\nRESULT: {len(names) - len(bad)}/{len(names)} exact; failures: {bad}")
    if args.json_out:
        import json

        session = "+".join(
            [s for s, on in (("lowmem", args.lowmem),
                             ("hostile", args.hostile)) if on]
        ) or "default"
        with open(args.json_out, "w") as f:
            json.dump({
                "session": session, "sf_dir": args.sf_dir,
                "exact": len(names) - len(bad), "total": len(names),
                "failures": bad, "entries": per_entry,
            }, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {args.json_out}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
