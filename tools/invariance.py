#!/usr/bin/env python
"""Parallelism-invariance certification — a validation axis the oracle
replay cannot cover on its own.

At 100 TB the cluster shape is never fixed: executor counts change,
``spark.sql.shuffle.partitions`` is retuned, input splits shrink or
grow with ``spark.sql.files.maxPartitionBytes``, AQE re-plans joins at
runtime, and a broadcast join on one cluster is a sort-merge join on
another.  NONE of that may change an answer.  This tool proves it for
every ``__spark_entry__.queries()`` entry by running the full registry
under several deliberately different session shapes and comparing the
canonicalized result values (the same ``ong_tsdb_spark.compare``
canonicalization the oracle gate pins) bit-for-bit across profiles:

- ``base``     — local[32], shuffle.partitions=32: the bench shape.
- ``splits``   — local[5], shuffle.partitions=11, 256 KiB
  ``maxPartitionBytes`` + zero ``openCostInBytes``: maximally many,
  maximally misaligned scan partitions and a prime shuffle width.
  Catches results that depend on input-split or batch boundaries
  (``mapInPandas`` batch shape, per-partition init, limit-without-order).
- ``strategy`` — local[7], shuffle.partitions=64, AQE fully off,
  auto-broadcast off: every join that Catalyst would broadcast or
  AQE would re-plan becomes a plain sort-merge join.  Catches results
  that depend on the physical join strategy or on AQE coalescing.

Each profile runs in its OWN subprocess (a JVM master cannot change
in-process) and writes ``{entry: {rows, cols, hash}}``; the parent
diffs every profile against ``base`` and exits 0 iff all entries are
value-identical everywhere.

    python tools/invariance.py [--sf-dir /root/testdata/sf0.01]
                               [--only NAME ...] [--out INVARIANCE.json]

Child mode (internal): ``--child --profile NAME --out FILE``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: profile -> (master, session confs).  Confs are also force-set at
#: runtime (getOrCreate may reuse a JVM) — every key here must be a
#: runtime-settable SQL conf.
PROFILES = {
    "base": ("local[32]", {
        "spark.sql.shuffle.partitions": "32",
    }),
    "splits": ("local[5]", {
        "spark.sql.shuffle.partitions": "11",
        "spark.sql.files.maxPartitionBytes": "262144",
        "spark.sql.files.openCostInBytes": "0",
    }),
    "strategy": ("local[7]", {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }),
}


def run_child(profile: str, sf_dir: str, only, out_path: str) -> int:
    from pyspark.sql import SparkSession

    from ong_tsdb_spark.compare import canon_rows

    master, confs = PROFILES[profile]
    builder = SparkSession.builder.master(master).config(
        "spark.ui.enabled", "false")
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = only or list(qs)
    results = {}
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            cols, rows = sdf.columns, sdf.collect()
            digest = hashlib.sha256(
                repr(canon_rows(cols, rows)).encode()).hexdigest()
            results[name] = {
                "rows": len(rows), "cols": sorted(cols), "hash": digest}
        except Exception as e:  # pragma: no cover - diagnostic path
            results[name] = {
                "error": f"{type(e).__name__}: {e}"[:200]}
        print(f"  [{profile} {i + 1}/{len(names)}] {name} "
              f"({time.time() - t0:.1f}s)", flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f)
    return 0


def diff_profiles(outs: dict, profiles: list) -> dict:
    """Cross-profile verdicts: per entry, MISMATCH if any non-base
    profile's value hash differs from base, ERROR if any profile
    errored or is missing the entry, OK otherwise."""
    base = outs[profiles[0]]
    report = {"entries": {}, "mismatches": [], "errors": []}
    for name, b in base.items():
        row = {profiles[0]: b}
        # accumulate across profiles — ERROR (a crashed profile) must
        # not be overwritten by a later MISMATCH or vice versa
        any_error = "error" in b
        any_mismatch = False
        for prof in profiles[1:]:
            o = outs[prof].get(name, {"error": "missing"})
            row[prof] = o
            if "error" in o:
                any_error = True
            elif "error" not in b and o["hash"] != b["hash"]:
                any_mismatch = True
        verdict = ("ERROR" if any_error
                   else "MISMATCH" if any_mismatch else "OK")
        row["verdict"] = verdict
        report["entries"][name] = row
        if verdict == "MISMATCH":
            report["mismatches"].append(name)
        elif verdict == "ERROR":
            report["errors"].append(name)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default=None,
                    help="write the cross-profile report JSON here")
    ap.add_argument("--profiles", nargs="*", default=list(PROFILES),
                    help="subset of profiles (base always implied first)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--profile", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child:
        return run_child(args.profile, args.sf_dir, args.only, args.out)

    profiles = list(dict.fromkeys(["base", *args.profiles]))
    outs = {}
    with tempfile.TemporaryDirectory() as tmp:
        for prof in profiles:
            out = os.path.join(tmp, f"{prof}.json")
            cmd = [sys.executable, os.path.abspath(__file__), "--child",
                   "--profile", prof, "--sf-dir", args.sf_dir, "--out", out]
            if args.only:
                cmd += ["--only", *args.only]
            print(f"== profile {prof}: {PROFILES[prof]}", flush=True)
            t0 = time.time()
            rc = subprocess.call(cmd, cwd=REPO)
            print(f"== profile {prof} done rc={rc} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if rc != 0:
                return rc
            outs[prof] = json.load(open(out))

    report = diff_profiles(outs, profiles)
    report["sf_dir"] = args.sf_dir
    report["profiles"] = {
        p: {"master": PROFILES[p][0], **PROFILES[p][1]} for p in profiles}

    n = len(report["entries"])
    ok = n - len(report["mismatches"]) - len(report["errors"])
    print(f"\nINVARIANCE: {ok}/{n} identical across {profiles}; "
          f"mismatches={report['mismatches']} errors={report['errors']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"report -> {args.out}")
    return 1 if (report["mismatches"] or report["errors"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
