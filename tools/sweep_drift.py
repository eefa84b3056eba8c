#!/usr/bin/env python
"""Directional-schema gate for the 10x/skew sweep artifacts
(VERDICT r11 #4): every family whose warm ratio moved beyond the
trigger (bench.SWEEP_MOVE_TRIGGER, 1.5x) between the previous round's
committed SCALE10/SKEW artifact and the newest one must carry a
``direction`` verdict (``recheck-exonerated`` / ``drift-real``) — the
in-sweep recheck bench.py's ``_adjudicate_sweep_movers`` writes.  A
bare-ratio mover fails the gate: that is exactly how the r10->r11
``text_classifier_train`` 2.94x->5.3x and the two skew drifters went
unadjudicated for a round.

    python tools/sweep_drift.py            # check both prefixes
    python tools/sweep_drift.py SCALE10    # one prefix

For each prefix the NEW side is the newest ``<prefix>_rNN.json`` in
the working tree and the OLD side the newest one committed at
``HEAD^{<new>}`` — i.e. the previous ROUND's artifact when the new one
is already committed, or HEAD's newest when it isn't yet.  Exits 0
when every mover is adjudicated (or there is nothing to compare);
exits 1 listing unexplained movers.  ``drift-real`` rows pass the gate
but are printed loudly — they owe a named cause in BENCH.md.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRIGGER = 1.5  # keep in sync with bench.SWEEP_MOVE_TRIGGER


def _round_of(prefix: str, path: str) -> int:
    m = re.search(rf"{prefix}_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def _newest_worktree(prefix: str) -> str | None:
    paths = glob.glob(os.path.join(REPO, f"{prefix}_r*.json"))
    return max(paths, key=lambda p: _round_of(prefix, p)) if paths else None


def _prev_committed(prefix: str, newer_than: int) -> dict | None:
    ls = subprocess.run(
        ["git", "-C", REPO, "ls-files", f"{prefix}_r*.json"],
        capture_output=True, text=True,
    ).stdout.split()
    older = [p for p in ls if _round_of(prefix, p) < newer_than]
    if not older:
        return None
    newest = max(older, key=lambda p: _round_of(prefix, p))
    proc = subprocess.run(
        ["git", "-C", REPO, "show", f"HEAD:{newest}"],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        return None
    try:
        return json.loads(proc.stdout)
    except ValueError:
        return None


def check(prefix: str) -> tuple[list[str], list[str]]:
    """-> (unexplained movers, drift-real rows) for one prefix."""
    new_path = _newest_worktree(prefix)
    if new_path is None:
        print(f"[{prefix}] no sweep artifact in the tree — nothing to check")
        return [], []
    new_round = _round_of(prefix, new_path)
    with open(new_path) as f:
        new = json.load(f)
    old = _prev_committed(prefix, new_round)
    if old is None:
        print(f"[{prefix}] {os.path.basename(new_path)}: no earlier "
              "committed artifact — nothing to compare")
        return [], []
    unexplained: list[str] = []
    real: list[str] = []
    oq, nq = old.get("queries", {}), new.get("queries", {})
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name].get("ratio_warm"), nq[name].get("ratio_warm")
        if not a or not b or a <= 0:
            continue
        move = b / a
        if 1.0 / TRIGGER < move < TRIGGER:
            continue
        direction = nq[name].get("direction")
        tag = (f"{name}: ratio {a}x -> {b}x ({move:.2f}x move), "
               f"direction={direction!r}")
        if direction is None:
            unexplained.append(tag)
        elif direction == "drift-real":
            real.append(tag)
        print(f"[{prefix}] mover {tag}")
    if not unexplained and not real:
        print(f"[{prefix}] {os.path.basename(new_path)}: every "
              f">{TRIGGER}x mover adjudicated (or none moved)")
    return unexplained, real


def main(argv=None) -> int:
    prefixes = (argv or sys.argv[1:]) or ["SCALE10", "SKEW"]
    unexplained: list[str] = []
    real: list[str] = []
    for p in prefixes:
        u, r = check(p)
        unexplained += u
        real += r
    if real:
        print("DRIFT-REAL (gate passes; these owe a named cause in "
              "BENCH.md):")
        for t in real:
            print(f"  {t}")
    if unexplained:
        print("UNEXPLAINED MOVERS (no direction field — regenerate the "
              "sweep with the current bench.py):")
        for t in unexplained:
            print(f"  {t}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
