#!/usr/bin/env python
"""Plan (and optionally write) the next driver-window rotation.

The correctness driver samples the FIRST 50 registry entries each
round, so `entry_queries._TAIL_ROTATION` must rotate a different
subset out every round or entries silently stop accruing driver
evidence.  With the registry past 100 entries two 50-entry windows no
longer cover everything, so the policy generalizes from "every other
round" to **evidence-staleness**: the next head = the <= 50 entries
whose most recent fully green driver row (rows+schema+hash) is
OLDEST — never-proven and red entries first.

    python tools/rotate.py            # print the plan
    python tools/rotate.py --write    # also rewrite _TAIL_ROTATION
                                      # between its BEGIN/END markers

Reads every CORRECTNESS_r*.json in the repo root (driver-written, one
per round).  The plan lists, per head entry, why it is in the head
(never-proven / red-in-rN / stale-since-rN); the tail is ordered
most-recently-proven LAST so near-stale entries sit nearest the
window boundary for the round after.  `--head-size` exists for
driver-window changes.  The rewrite is idempotent and pytest
(`test_registry_window_invariants`) still enforces the hard cap.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "# --- TAIL_ROTATION BEGIN (managed by tools/rotate.py) ---"
END = "# --- TAIL_ROTATION END ---"


def last_green_rounds(max_round: int | None = None) -> dict[str, int]:
    """entry -> highest round number with a fully green driver row.

    ``max_round`` restricts the evidence window (rounds > max_round are
    ignored) so a committed rotation can be re-validated against the
    exact evidence it was planned on — new driver round files written
    AFTER the plan must not retroactively turn the suite red
    (VERDICT r6 #1).
    """
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            data = json.load(open(path))
        except Exception as ex:  # noqa: BLE001 — a corrupt round file shouldn't kill planning
            print(f"WARNING: skipping unreadable {path}: {ex}", file=sys.stderr)
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and all(
                rec.get(k) for k in ("rows_match", "schema_match", "hash_match")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def plan(
    head_size: int, max_round: int | None = None
) -> tuple[list[str], list[str], dict[str, int]]:
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    green = last_green_rounds(max_round)
    # staleness order: never-green first (round 0), then oldest green;
    # ties broken by current registry order so the plan is stable
    order = {n: i for i, n in enumerate(names)}
    ranked = sorted(names, key=lambda n: (green.get(n, 0), order[n]))
    head = ranked[:head_size]
    # tail: most-recently-proven LAST (nearest the window boundary)
    tail = sorted(
        (n for n in names if n not in set(head)),
        key=lambda n: (green.get(n, 0), order[n]),
    )
    return head, tail, green


PLANNED_ON_RE = re.compile(r"^# planned-on: r(\d+)\.\.r(\d+)$", re.M)


def read_planned_on(path: str | None = None) -> int | None:
    """Return the upper round of the committed rotation's evidence
    window (the ``# planned-on: rN..rM`` marker inside the managed
    block), or None for a pre-marker file."""
    if path is None:
        path = os.path.join(REPO, "ong_tsdb_spark", "entry_queries.py")
    m = PLANNED_ON_RE.search(open(path).read())
    return int(m.group(2)) if m else None


def rewrite_tail(
    tail: list[str], path: str | None = None, planned_on: int | None = None
) -> None:
    if path is None:
        path = os.path.join(REPO, "ong_tsdb_spark", "entry_queries.py")
    src = open(path).read()
    if BEGIN not in src or END not in src:
        raise SystemExit("rotation markers not found in entry_queries.py")
    if planned_on is None:
        planned_on = max(last_green_rounds().values(), default=0)
    lines = [BEGIN, f"# planned-on: r01..r{planned_on:02d}", "_TAIL_ROTATION = ["]
    body = "\n".join(lines + [f'    "{n}",' for n in tail] + ["]", END])
    pre, rest = src.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    open(path, "w").write(pre + body + post)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--head-size", type=int, default=50)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args(argv)

    head, tail, green = plan(args.head_size)
    latest = max(green.values(), default=0)
    print(f"registry={len(head) + len(tail)} head={len(head)} tail={len(tail)} "
          f"latest_round=r{latest:02d}")
    for n in head:
        why = (
            "never-proven" if n not in green
            else f"stale-since-r{green[n]:02d}"
        )
        print(f"  head: {n} ({why})")
    over = [n for n in tail if green.get(n, 0) < latest - 1]
    if over:
        print(f"WARNING: {len(over)} tail entries will be >2 rounds stale "
              f"next round: {over}")
    if args.write:
        rewrite_tail(tail, planned_on=latest)
        print(f"wrote _TAIL_ROTATION (planned-on r01..r{latest:02d}; run "
              "pytest tests/test_entry.py -k invariants to confirm)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
