"""Crash simulation for the upsert write path — the Spark twin of the
reference's atomic-write crash tests (tests/test_fileutils.py:297-357:
interrupted ``safe_createfile`` leaves the old chunk readable and a
stale ``.tmp`` that the next write cleans up).

Our commit protocol is Spark's task-commit (staging under
``_temporary`` + rename at job commit) with per-write dynamic
partition overwrite, so the equivalent contracts are:

1. a write job that DIES mid-flight (executor failure) leaves the old
   data byte-readable — dynamic overwrite deletes nothing before job
   commit — the lock released, and the engine retryable;
2. a crash AFTER job commit but BEFORE the version bump leaves the
   data committed and the same write idempotently re-runnable;
3. staging debris from a crashed writer (``_temporary``, dot-tmp
   files) is invisible to readers and to later writes;
4. an upsert touching chunk B never rewrites chunk A's files, so a
   crashed B-write cannot damage A (the blast radius is the touched
   partition, exactly the reference's one-chunk-at-a-time guarantee).
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from ong_tsdb_spark import OngTsdbSpark


@pytest.fixture()
def eng(spark, tmp_path):
    e = OngTsdbSpark(spark, str(tmp_path / "tsdb"))
    e.create_db("test")
    return e


def _mk_pdf(n=10, freq="1h", start="2023-01-02", metrics=("active",)):
    idx = pd.date_range(start, periods=n, freq=freq, tz="UTC")
    data = {m: np.arange(n, dtype="float64") + 10 * i for i, m in enumerate(metrics)}
    return pd.DataFrame(data, index=idx)


def _dir_digest(path: str) -> dict[str, str]:
    """relative-path -> sha256 for every visible file under path."""
    out = {}
    for p in glob.glob(os.path.join(path, "**", "*"), recursive=True):
        base = os.path.basename(p)
        if os.path.isfile(p) and not base.startswith(("_", ".")):
            rel = os.path.relpath(p, path)
            out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


def test_aborted_write_job_leaves_old_data_intact(eng, spark):
    """Contract 1: poison a batch so the write JOB fails in-flight
    (the executor-crash shape); the stored data must remain exactly
    the pre-write bytes, the lock must be released, and a clean retry
    must succeed."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf

    eng.create_sensor("test", "s1", "1h", ["active"])
    pdf = _mk_pdf(10)
    eng.write_df("test", "s1", pdf)
    data_path = eng.catalog.data_path("test", "s1")
    before = _dir_digest(data_path)
    assert before  # sanity: something was written

    @pandas_udf("double")
    def poison(v: pd.Series) -> pd.Series:
        raise RuntimeError("simulated executor crash")

    bad = spark.range(5).select(
        (F.lit(1672617600.0) + F.col("id") * 3600.0).alias("ts_sec"),
        poison(F.col("id").cast("double")).alias("active"),
    )
    with pytest.raises(Exception, match="simulated executor crash|Job aborted"):
        eng.write_spark_df("test", "s1", bad)

    # old data byte-identical — dynamic overwrite deleted nothing
    assert _dir_digest(data_path) == before
    out = eng.read_pandas("test", "s1")
    assert out["active"].tolist() == pdf["active"].astype("float32").tolist()

    # lock released: a clean retry writes through
    pdf2 = _mk_pdf(10, start="2023-01-03")
    eng.write_df("test", "s1", pdf2)
    assert len(eng.read_pandas("test", "s1")) == 20


def test_crash_between_commit_and_version_bump(eng, monkeypatch):
    """Contract 2: the version bump is the LAST step; dying on it must
    leave the committed data readable and the identical write
    re-runnable (idempotent last-wins upsert)."""
    eng.create_sensor("test", "s2", "1h", ["active"])
    pdf = _mk_pdf(10)

    real_bump = eng.catalog.bump_version
    calls = {"n": 0}

    def dying_bump(db, sensor):
        calls["n"] += 1
        raise OSError("simulated crash before version bump")

    monkeypatch.setattr(eng.catalog, "bump_version", dying_bump)
    with pytest.raises(OSError, match="simulated crash"):
        eng.write_df("test", "s2", pdf)
    assert calls["n"] == 1

    # the data job committed before the crash point
    out = eng.read_pandas("test", "s2")
    assert out.equals(pdf.astype("float32"))

    # recovery: rerun the SAME write with the bump restored
    monkeypatch.setattr(eng.catalog, "bump_version", real_bump)
    eng.write_df("test", "s2", pdf)
    out = eng.read_pandas("test", "s2")
    assert out.equals(pdf.astype("float32"))


def test_staging_debris_invisible_to_readers_and_writers(eng):
    """Contract 3: ``_temporary`` trees and dot-tmp files from a
    crashed writer must not corrupt reads (Spark data discovery skips
    ``_``/``.`` names) nor block later writes."""
    eng.create_sensor("test", "s3", "1h", ["active"])
    pdf = _mk_pdf(10)
    eng.write_df("test", "s3", pdf)
    data_path = eng.catalog.data_path("test", "s3")

    tmp_tree = os.path.join(data_path, "_temporary", "0", "task_000")
    os.makedirs(tmp_tree)
    with open(os.path.join(tmp_tree, "part-crashed.parquet"), "wb") as f:
        f.write(b"\x00garbage not parquet")
    part_dir = glob.glob(os.path.join(data_path, "chunk_start=*"))[0]
    with open(os.path.join(part_dir, ".part-crashed.parquet.tmp"), "wb") as f:
        f.write(b"\x00more garbage")

    out = eng.read_pandas("test", "s3")
    assert out.equals(pdf.astype("float32"))

    # a subsequent upsert through the same dirs still works
    pdf2 = _mk_pdf(4, start="2023-01-02", metrics=("active",)) + 100.0
    eng.write_df("test", "s3", pdf2)
    out = eng.read_pandas("test", "s3")
    assert len(out) == 10
    assert out["active"].iloc[0] == np.float32(100.0)  # upsert won


def test_untouched_chunk_files_never_rewritten(eng):
    """Contract 4: an upsert whose batch touches only chunk B leaves
    chunk A's files BYTE-identical — the dynamic-overwrite blast
    radius is the touched partition, so a crashed B-write cannot
    damage A."""
    eng.create_sensor("test", "s4", "1s", ["active"])
    # 10-min spacing spans multiple 16384-s chunks
    pdf = _mk_pdf(60, "10min")
    eng.write_df("test", "s4", pdf)
    data_path = eng.catalog.data_path("test", "s4")
    parts = sorted(glob.glob(os.path.join(data_path, "chunk_start=*")))
    assert len(parts) >= 2
    first_before = _dir_digest(parts[0])

    # rewrite only the LAST timestamp (deepest chunk)
    late = pdf.iloc[[-1]] + 5.0
    eng.write_df("test", "s4", late)

    assert _dir_digest(parts[0]) == first_before
    out = eng.read_pandas("test", "s4")
    assert out["active"].iloc[-1] == np.float32(pdf["active"].iloc[-1] + 5.0)
