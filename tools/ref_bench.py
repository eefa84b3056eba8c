#!/usr/bin/env python
"""Measure the REFERENCE engine's single-node throughput on the same
workload shape `bench.py`'s engine path times — the direct A/B
BASELINE.md could not give (the reference publishes no absolute
numbers).

    python tools/ref_bench.py [--sf-dir /root/testdata/sf0.1]

Runs the reference's own code from /root/reference/src (read-only,
imported in place — nothing is copied) against two stdlib shims for
its small external deps:

* ``ujson``     -> stdlib ``json`` (same loads/dumps surface),
* ``ong_utils`` -> a minimal OngConfig/LOCAL_TZ (config keys the
  reference reads: BASE_DIR, admin_token, FILE_USER/GROUP,
  uncompressed_chunks).

Fidelity notes, so the comparison is honest:

* Chunks are written UNCOMPRESSED — that is the reference's own
  default (``uncompressed_chunks`` unset -> retention -1 ->
  ``Chunker.compressed_by_policy`` False), and it FAVORS the
  reference: our engine zstd-compresses every Parquet chunk.
* The batch is pre-grouped per chunk before ``write_tick_numpy``
  (each call writes the chunk of ``np_timestamps[0]``) — exactly the
  grouping the reference server does before writing (SURVEY A4), so
  the reference is driven through its intended batch path, not
  tick-by-tick HTTP.
* Workload = bench.py's engine path: 100k event ticks onto a 1 s-grid
  single-metric sensor, a 10% upsert overlay, a 7-day range read, and
  last-timestamp.
"""

from __future__ import annotations

import argparse
import json as _json
import logging
import os
import shutil
import sys
import tempfile
import time
import types
import zoneinfo


def _install_shims(base_dir: str) -> None:
    uj = types.ModuleType("ujson")
    uj.loads = _json.loads
    uj.dumps = _json.dumps
    sys.modules.setdefault("ujson", uj)

    ou = types.ModuleType("ong_utils")

    class OngConfig:
        def __init__(self, _name: str):
            self._cfg = {"BASE_DIR": base_dir, "admin_token": "admintoken"}

        def config(self, key, default=None):
            return self._cfg.get(key, default)

        logger = logging.getLogger("ref_bench")

    ou.OngConfig = OngConfig
    ou.LOCAL_TZ = zoneinfo.ZoneInfo("UTC")
    ou.is_windows = sys.platform.startswith("win")
    sys.modules.setdefault("ong_utils", ou)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--ref-src", default="/root/reference/src")
    args = ap.parse_args(argv)

    import duckdb
    import numpy as np

    base = tempfile.mkdtemp(prefix="ref_tsdb_")
    _install_shims(base)
    sys.path.insert(0, args.ref_src)
    from ong_tsdb.database import OngTSDB

    rel = duckdb.sql(
        f"SELECT epoch_us(ts) / 1000000.0 AS ts_sec, value::DOUBLE AS value "
        f"FROM '{args.sf_dir}/events.parquet' ORDER BY ts_sec"
    )
    rows = rel.fetchnumpy()
    ts, vals = rows["ts_sec"].astype(np.float64), rows["value"].astype(np.float64)
    n = len(ts)

    out: dict[str, float] = {}
    try:
        db = OngTSDB(path=os.path.join(base, "db"))
        ADMIN = "admintoken"
        db.create_db(ADMIN, "bench")
        db.create_sensor(ADMIN, "bench", "events_1s", "1s",
                         write_key="w", read_key="r", metrics=["value"])

        chunk_s = 16384.0  # 1 s grid x 2^14 rows/chunk
        def ingest(t: np.ndarray, v: np.ndarray) -> int:
            """Per-chunk grouped write_tick_numpy calls (the server's
            batch grouping); returns the number of chunk writes."""
            order = np.argsort(t, kind="mergesort")
            t, v = t[order], v[order]
            starts = (t // chunk_s).astype(np.int64)
            writes = 0
            lo = 0
            for hi in range(1, len(t) + 1):
                if hi == len(t) or starts[hi] != starts[lo]:
                    db.write_tick_numpy(
                        "w", "bench", "events_1s",
                        v[lo:hi].reshape(-1, 1), t[lo:hi],
                    )
                    writes += 1
                    lo = hi
            return writes

        t0 = time.perf_counter()
        n_chunks = ingest(ts, vals)
        out["ref_engine_ingest"] = round(time.perf_counter() - t0, 4)
        print(f"[ref] ingest: {n} ticks -> {n_chunks} chunk writes in "
              f"{out['ref_engine_ingest']:.2f}s "
              f"({n / out['ref_engine_ingest']:,.0f} rows/s)", file=sys.stderr)

        t0 = time.perf_counter()
        ingest(ts[: max(n // 10, 1)], vals[: max(n // 10, 1)])
        out["ref_engine_upsert_10pct"] = round(time.perf_counter() - t0, 4)

        lo = float(ts.min())
        t0 = time.perf_counter()
        dates, values = db.read("r", "bench", "events_1s",
                                start_ts=lo, end_ts=lo + 7 * 86400)
        out["ref_engine_range_read"] = round(time.perf_counter() - t0, 4)
        print(f"[ref] range read: {0 if dates is None else len(dates)} rows in "
              f"{out['ref_engine_range_read']:.2f}s", file=sys.stderr)

        t0 = time.perf_counter()
        db.get_last_timestamp("r", "bench", "events_1s")
        out["ref_engine_last_ts"] = round(time.perf_counter() - t0, 4)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(_json.dumps({
        "metric": "reference_engine_path",
        "value": round(sum(out.values()), 4),
        "unit": "sec",
        "queries": out,
        "sf": args.sf_dir.rstrip("/").split("sf")[-1],
        "n_ticks": n,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
