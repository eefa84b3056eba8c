"""Unit gate for tools/invariance.py's pure pieces — the profile
table and the cross-profile diff.  The Spark-spawning path is the
round-close sweep (`python tools/invariance.py`), not a pytest job:
it launches three JVMs over the full registry.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "invariance_mod", os.path.join(REPO, "tools", "invariance.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_profiles_are_deliberately_different():
    inv = _load()
    assert set(inv.PROFILES) == {"base", "splits", "strategy"}
    masters = {p: m for p, (m, _) in inv.PROFILES.items()}
    assert len(set(masters.values())) == 3  # three core counts
    widths = {
        p: c["spark.sql.shuffle.partitions"]
        for p, (_, c) in inv.PROFILES.items()}
    assert len(set(widths.values())) == 3  # three shuffle widths
    _, strat = inv.PROFILES["strategy"]
    assert strat["spark.sql.adaptive.enabled"] == "false"
    assert strat["spark.sql.autoBroadcastJoinThreshold"] == "-1"
    _, splits = inv.PROFILES["splits"]
    assert int(splits["spark.sql.files.maxPartitionBytes"]) <= 1 << 20


def test_diff_profiles_verdicts():
    inv = _load()
    h = {"rows": 3, "cols": ["a"], "hash": "h1"}
    outs = {
        "base": {"ok": h, "drift": h, "boom": h, "dead": {"error": "X"}},
        "p2": {
            "ok": dict(h),
            "drift": {"rows": 3, "cols": ["a"], "hash": "OTHER"},
            "boom": {"error": "Py4JError: ..."},
            "dead": {"error": "X"},
        },
    }
    rep = inv.diff_profiles(outs, ["base", "p2"])
    v = {k: r["verdict"] for k, r in rep["entries"].items()}
    assert v == {"ok": "OK", "drift": "MISMATCH", "boom": "ERROR",
                 "dead": "ERROR"}
    assert rep["mismatches"] == ["drift"]
    assert sorted(rep["errors"]) == ["boom", "dead"]


def test_diff_profiles_error_not_overwritten_by_later_mismatch():
    """An entry that crashes under one profile AND mismatches under
    another must be classified ERROR regardless of profile order —
    last-writer-wins would misfile the failure class."""
    inv = _load()
    h = {"rows": 3, "cols": ["a"], "hash": "h1"}
    outs = {
        "base": {"x": dict(h)},
        "p2": {"x": {"error": "boom"}},
        "p3": {"x": {"rows": 3, "cols": ["a"], "hash": "OTHER"}},
    }
    rep = inv.diff_profiles(outs, ["base", "p2", "p3"])
    assert rep["entries"]["x"]["verdict"] == "ERROR"
    assert rep["errors"] == ["x"] and rep["mismatches"] == []
    # reversed order: mismatch first, error later — still ERROR
    rep2 = inv.diff_profiles(outs, ["base", "p3", "p2"])
    assert rep2["entries"]["x"]["verdict"] == "ERROR"


def test_diff_profiles_missing_entry_is_error():
    inv = _load()
    h = {"rows": 1, "cols": ["a"], "hash": "h"}
    rep = inv.diff_profiles(
        {"base": {"only_in_base": h}, "p2": {}}, ["base", "p2"])
    assert rep["entries"]["only_in_base"]["verdict"] == "ERROR"
