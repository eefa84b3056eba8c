"""Task-retry determinism for the mapInPandas operators (VERDICT r13
#5).  At cluster scale task retries are routine (preemption, spot
kills, fetch failures); a partition whose retry emits different rows
silently breaks the engine's exactness guarantees.  The injection
needs ``spark.task.maxFailures > 1`` — a SparkContext-level setting the
shared ``local[N]`` fixture JVM cannot provide — so the scenario runs
in a child process under ``local[4, 3]`` (see tests/_retry_child.py
for the full protocol: TaskContext-attempt-aware mid-task failures on
attempt 0, bit-identical compare vs the clean run, and an accumulator
proving the injection actually fired)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SMALL_SF", "/root/testdata/sf0.001")


def test_mapinpandas_operators_survive_task_retries(tmp_path):
    child = os.path.join(REPO, "tests", "_retry_child.py")
    mark_dir = tmp_path / "inj"
    mark_dir.mkdir()
    proc = subprocess.run(
        [sys.executable, child, REPO, SF_DIR, str(mark_dir)],
        capture_output=True, text=True, timeout=600,
    )
    out = proc.stdout
    assert proc.returncode == 0, f"child failed:\n{out}\n{proc.stderr[-4000:]}"
    assert "pack_sequences retry-stable" in out, out
    assert "extract_features retry-stable" in out, out
    assert "ledger_dedup retry-stable" in out, out
    assert "RETRY-DETERMINISM OK" in out, out
