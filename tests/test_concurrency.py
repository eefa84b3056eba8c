"""Concurrency + volume parity with the reference's hardest tests:
4 concurrent writers with a schema extender and a post-hoc audit
(tests/test_database.py:141-207), and the 10,000-point multi-chunk
round trip (tests/test_client.py:148-153).
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
import pytest

from ong_tsdb_spark import OngTsdbSpark
from ong_tsdb_spark.plans import maintenance


@pytest.fixture()
def eng(spark, tmp_path):
    e = OngTsdbSpark(spark, str(tmp_path / "tsdb"))
    e.create_db("d")
    return e


def test_concurrent_writers_with_schema_extension(eng):
    eng.create_sensor("d", "s", "1s", ["m0"])
    base = 1672617600
    errors: list[Exception] = []

    def writer(thread_id: int) -> None:
        try:
            for batch in range(3):
                # each thread owns a disjoint ts range; thread 2 also
                # introduces a new metric mid-stream (the extender)
                metric = "m0" if thread_id != 2 or batch == 0 else f"m{thread_id}"
                pts = [
                    (metric, float(thread_id * 1000 + batch), float(base + thread_id * 100 + batch * 10 + i))
                    for i in range(5)
                ]
                eng.write_points("d", "s", pts)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # audit: every written cell holds the last value written to it and
    # the dataset has no duplicate or off-grid rows
    st = maintenance.verify_sensor(eng, "d", "s")
    assert st.duplicate_ts == 0 and st.off_grid == 0
    assert st.n_rows == 4 * 3 * 5
    out = eng.read_pandas("d", "s")
    assert "m2" in out.columns  # extender's metric arrived
    # thread 0 batch 2 wrote value 2.0 at base+20..base+24 in m0
    row = out.loc[pd.Timestamp(base + 20, unit="s", tz="UTC")]
    assert row["m0"] == 2.0


@pytest.mark.slow
def _locked_increment_worker(sensor_dir: str, counter: str, n_iters: int) -> None:
    """Module-level so multiprocessing 'spawn' can pickle it."""
    from ong_tsdb_spark.locks import SensorFileLock

    for _ in range(n_iters):
        with SensorFileLock(sensor_dir, timeout=30.0):
            with open(counter) as f:
                v = int(f.read())
            with open(counter, "w") as f:
                f.write(str(v + 1))


def test_file_lock_cross_process_mutual_exclusion(tmp_path):
    """ROADMAP #2 lock protocol, proven across real OS processes: N
    processes do lock-protected read-modify-write on one counter file;
    every increment must survive (lost updates would show a lower
    final count).  No Spark involved — this pins the O_EXCL mutex."""
    import multiprocessing as mp
    import os

    sensor_dir = str(tmp_path / "sensor")
    counter = str(tmp_path / "counter.txt")
    os.makedirs(sensor_dir)
    with open(counter, "w") as f:
        f.write("0")

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_locked_increment_worker, args=(sensor_dir, counter, 25))
        for _ in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    assert all(p.exitcode == 0 for p in procs)
    with open(counter) as f:
        assert int(f.read()) == 100


def test_stale_lock_is_broken(tmp_path):
    import os
    import time

    from ong_tsdb_spark.locks import SensorFileLock, SensorLockTimeout

    sensor_dir = str(tmp_path / "s")
    os.makedirs(sensor_dir)
    # a crashed writer left a lock; age it past stale_after
    stale = SensorFileLock(sensor_dir)
    stale.acquire()
    old = time.time() - 1000
    os.utime(stale.path, (old, old))
    lk = SensorFileLock(sensor_dir, timeout=5.0, stale_after=300.0)
    lk.acquire()  # breaks the stale lock instead of timing out
    lk.release()
    # a FRESH foreign lock is respected -> timeout
    fresh = SensorFileLock(sensor_dir)
    fresh.acquire()
    with pytest.raises(SensorLockTimeout):
        SensorFileLock(sensor_dir, timeout=0.3).acquire()
    fresh.release()


def test_heartbeat_keeps_long_write_alive(tmp_path):
    """Round-2 ADVICE: a LIVE holder whose write outlasts stale_after
    must not have its lock broken — the holder heartbeats (touches the
    lockfile), so waiters always see a fresh mtime."""
    import os
    import time

    from ong_tsdb_spark.locks import SensorFileLock, SensorLockTimeout

    sensor_dir = str(tmp_path / "s")
    os.makedirs(sensor_dir)
    holder = SensorFileLock(sensor_dir, stale_after=1.0)  # heartbeat ~0.25s
    holder.acquire()
    time.sleep(2.5)  # well past stale_after in wall-clock age
    # the lock was ACQUIRED > stale_after ago, but heartbeats keep the
    # mtime fresh: the waiter must time out, not break it
    with pytest.raises(SensorLockTimeout):
        SensorFileLock(sensor_dir, timeout=1.5, stale_after=1.0).acquire()
    holder.release()


def test_stale_break_spares_recreated_lock(tmp_path):
    """The waiter remembers the (payload, mtime) it saw stale and only
    unlinks on a second identical sighting — a lock re-created by a
    different process between polls (new payload) survives."""
    import os

    from ong_tsdb_spark.locks import SensorFileLock

    sensor_dir = str(tmp_path / "s")
    os.makedirs(sensor_dir)
    lockfile = os.path.join(sensor_dir, "_writer.lock")
    with open(lockfile, "wb") as f:
        f.write(b"999 1.0\n")
    old = 1.0
    os.utime(lockfile, (old, old))
    waiter = SensorFileLock(sensor_dir, timeout=5.0, stale_after=300.0)
    waiter._maybe_break_stale()  # first sighting: records, must NOT unlink
    assert os.path.exists(lockfile)
    # another process breaks + re-creates the lock between our polls
    os.unlink(lockfile)
    with open(lockfile, "wb") as f:
        f.write(b"1000 2.0\n")
    os.utime(lockfile, (old, old))  # even if its mtime looks stale too
    waiter._maybe_break_stale()  # different payload -> new first sighting
    assert os.path.exists(lockfile)
    waiter._maybe_break_stale()  # second identical sighting -> break
    assert not os.path.exists(lockfile)


def test_two_engine_instances_serialize_writes(spark, tmp_path):
    """Two engine INSTANCES (separate thread-lock registries — the
    in-process lock cannot serialize them, exactly like two driver
    processes) upsert interleaved batches to one sensor.  The file
    lock must serialize the read-merge-overwrite cycles: every row
    from both writers survives, and the write version counts every
    commit."""
    base_dir = str(tmp_path / "shared")
    e1 = OngTsdbSpark(spark, base_dir)
    e2 = OngTsdbSpark(spark, base_dir)
    e1.create_db("d")
    e1.create_sensor("d", "s", "1s", ["v"])
    base = 1672617600
    errors: list[Exception] = []

    def writer(engine: OngTsdbSpark, offset: int) -> None:
        try:
            for batch in range(4):
                pts = [
                    ("v", float(offset + batch * 10 + i), float(base + offset + batch * 10 + i))
                    for i in range(5)
                ]
                engine.write_points("d", "s", pts)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t1 = threading.Thread(target=writer, args=(e1, 0))
    t2 = threading.Thread(target=writer, args=(e2, 1000))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    out = e1.read_pandas("d", "s")
    assert len(out) == 40  # 2 writers x 4 batches x 5 points, none lost
    assert e1.get_write_version("d", "s") == 8  # one bump per commit


def test_10k_point_round_trip(eng):
    # the reference's largest workload: 10k points, 10-min spacing,
    # 1 s sensor -> ~366 chunks (tests/test_client.py:148-153)
    eng.create_sensor("d", "big", "1s", ["active", "reactive"])
    idx = pd.date_range("2023-01-02", periods=10_000, freq="10min", tz="UTC")
    pdf = pd.DataFrame(
        {"active": np.arange(10_000.0), "reactive": np.arange(10_000.0) * 2},
        index=idx,
    )
    eng.write_df("d", "big", pdf)
    out = eng.read_pandas("d", "big")
    assert out.equals(pdf.astype("float32"))
    assert eng.get_last_timestamp("d", "big") == idx[-1].timestamp()
    # range read in the middle, still pruned + exact
    mid = eng.read_pandas(
        "d", "big", start_ts=idx[5000].timestamp(), end_ts=idx[5100].timestamp()
    )
    assert len(mid) == 101
    assert mid["active"].iloc[0] == 5000.0


def test_lock_release_checks_ownership(tmp_path):
    """Code-review r9: a holder whose lock was stale-broken (VM pause
    past the horizon) must NOT unlink the NEW holder's lock on resume
    — release only deletes the file when its payload is our own; the
    heartbeat likewise stands down on a foreign payload."""
    import os

    from ong_tsdb_spark.locks import SensorFileLock

    sensor_dir = str(tmp_path)
    a = SensorFileLock(sensor_dir, stale_after=300.0)
    a.acquire()
    # simulate the stale break + re-acquire while A is 'paused'
    if a._hb_stop is not None:  # stop A's heartbeat like a paused VM
        a._hb_stop.set()
        a._hb_thread.join(timeout=2.0)
        a._hb_stop = a._hb_thread = None
    os.unlink(a.path)
    b = SensorFileLock(sensor_dir, stale_after=300.0)
    b.acquire()
    b_payload = open(b.path, "rb").read()
    # A resumes and releases: B's lock must survive
    a.release()
    assert os.path.exists(b.path), "resumed stale holder deleted B's lock"
    assert open(b.path, "rb").read() == b_payload
    # B's own release still works
    b.release()
    assert not os.path.exists(b.path)


def test_catalog_rejects_path_alias_names(tmp_path, spark):
    """Code-review r9: '.' and '..' matched _SAFE_NAME, so
    delete_db('..') would rmtree the PARENT of the catalog root. Pure
    -dot names must be invalid; dotted names stay fine."""
    import pytest as _pytest

    from ong_tsdb_spark import OngTsdbSpark

    eng = OngTsdbSpark(spark, str(tmp_path / "tsdb"))
    for bad in (".", "..", "..."):
        with _pytest.raises(ValueError):
            eng.create_db(bad)
        with _pytest.raises(ValueError):
            eng.delete_db(bad)
    eng.create_db("ok.v2")  # interior dots remain legal
    assert eng.exist_db("ok.v2")


def test_create_sensor_rejects_reserved_metric_names(tmp_path, spark):
    """Code-review r9: metrics named after the storage columns
    (ts_sec, chunk_start) would be silently clobbered/dropped by the
    write path — reject at config-write time."""
    import pytest as _pytest

    from ong_tsdb_spark import OngTsdbSpark

    eng = OngTsdbSpark(spark, str(tmp_path / "tsdb2"))
    eng.create_db("d")
    for bad in (["chunk_start"], ["v", "ts_sec"]):
        with _pytest.raises(ValueError, match="reserved"):
            eng.create_sensor("d", "s", "1s", bad)
    eng.create_sensor("d", "s", "1s", ["v"])  # sane names still fine


def test_lock_release_unreadable_file_never_raises(tmp_path, caplog):
    """ADVICE r9: an ownership-read failure other than FileNotFoundError
    (EACCES, transient FS error) must not escape release()/__exit__ —
    it would mask the with-block's real exception — and must not delete
    a lock we cannot prove is ours.  Simulated by replacing the
    lockfile with a directory (open() -> IsADirectoryError).  The
    signal is a LOG record, not warnings.warn — a -W error process
    would turn the warn itself into the raise this path must never
    produce (code-review r10)."""
    import logging
    import os

    from ong_tsdb_spark.locks import SensorFileLock

    a = SensorFileLock(str(tmp_path), stale_after=300.0)
    a.acquire()
    os.unlink(a.path)
    os.mkdir(a.path)  # unreadable as a file
    with caplog.at_level(logging.WARNING, logger="ong_tsdb_spark.locks"):
        a.release()  # must not raise
    assert any("could not read" in r.getMessage() for r in caplog.records)
    assert os.path.isdir(a.path), "release deleted a lock it could not verify"
    os.rmdir(a.path)


def test_lock_release_missing_file_is_silent(tmp_path, caplog):
    """The benign already-gone case stays log-free."""
    import logging
    import os

    from ong_tsdb_spark.locks import SensorFileLock

    a = SensorFileLock(str(tmp_path), stale_after=300.0)
    a.acquire()
    os.unlink(a.path)
    with caplog.at_level(logging.WARNING, logger="ong_tsdb_spark.locks"):
        a.release()
    assert not caplog.records
