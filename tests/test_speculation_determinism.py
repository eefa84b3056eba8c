"""Speculative-execution determinism for the mapInPandas operators —
the cluster-routine twin of the task-retry axis (r14).

``spark.speculation`` races a second attempt of a straggling task and
commits whichever finishes first; an operator whose output depends on
the winning attempt breaks exactness silently on any busy fleet.  The
speculation scheduler starts ONLY for non-local backends
(``!isLocal`` in TaskSchedulerImpl — probed and confirmed on this
Spark: an aggressive profile on local[8] never launches a single
speculative attempt), so this test brings up a REAL standalone master
plus two worker JVMs on loopback, then runs tests/_speculation_child.py
against it.  Two placement facts this harness had to learn (kept here
because they make or break any speculation repro): a speculative copy
is NEVER placed on a HOST that already runs an attempt of that task,
so both workers bind distinct loopback addresses (127.0.0.2/3 — one
shared 127.0.0.1 "host" can never speculate); and a worker whose web
UI port fails to bind dies silently, halving the cluster (the first
version computed "809"+str(8+i) = port 80910).  With the topology up: partition 0's first attempt straggles (sleeps after
yielding — no failure, nothing retries), the speculative copy
overtakes it, and `pack_sequences` / `extract_features` output must be
bit-identical to a no-straggler run, with attemptNumber>0 marker files
proving speculation actually fired."""
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SMALL_SF", "/root/testdata/sf0.001")

MASTER_PORT = 7099  # off the standalone_smoke.sh ports


def _spark_class():
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-class")


def test_mapinpandas_operators_survive_speculative_execution(tmp_path):
    spark_class = _spark_class()
    if not os.path.exists(spark_class):
        pytest.skip("spark-class launcher not available")
    logdir = tmp_path / "cluster"
    logdir.mkdir()
    mark_dir = tmp_path / "spec"
    mark_dir.mkdir()
    procs = []
    try:
        procs.append(subprocess.Popen(
            [spark_class, "org.apache.spark.deploy.master.Master",
             "-h", "127.0.0.1", "-p", str(MASTER_PORT),
             "--webui-port", "8190"],
            stdout=open(logdir / "master.log", "w"),
            stderr=subprocess.STDOUT,
        ))
        time.sleep(5)
        for i in (1, 2):
            procs.append(subprocess.Popen(
                [spark_class, "org.apache.spark.deploy.worker.Worker",
                 f"spark://127.0.0.1:{MASTER_PORT}", "-c", "4", "-m", "3g",
                 "-h", f"127.0.0.{i + 1}",  # distinct hosts: see docstring
                 "--webui-port", str(8190 + i)],
                stdout=open(logdir / f"worker{i}.log", "w"),
                stderr=subprocess.STDOUT,
                env={**os.environ, "SPARK_WORKER_DIR": str(logdir / f"w{i}")},
            ))
        time.sleep(8)

        child = os.path.join(REPO, "tests", "_speculation_child.py")
        proc = subprocess.run(
            [sys.executable, child, REPO, SF_DIR, str(mark_dir),
             f"spark://127.0.0.1:{MASTER_PORT}"],
            capture_output=True, text=True, timeout=480,
        )
        out = proc.stdout
        assert proc.returncode == 0, (
            f"child failed:\n{out}\n{proc.stderr[-4000:]}"
        )
        assert "pack_sequences speculation-stable" in out, out
        assert "extract_features speculation-stable" in out, out
        assert "SPECULATION-DETERMINISM OK" in out, out
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
