#!/usr/bin/env python
"""Per-query drift report between two bench runs (VERDICT r7 #7):
diff the ``queries`` dicts of two BENCH_DETAIL.json snapshots and flag
every mover beyond a ratio threshold, so round-over-round drift
analyses (r6's warmup study, r7's emb-family question) are one command
instead of a manual spreadsheet.

    python tools/bench_drift.py                 # HEAD vs working tree
    python tools/bench_drift.py git:HEAD~5      # older rev vs tree
    python tools/bench_drift.py old.json new.json
    python tools/bench_drift.py --threshold 1.5 --all

Sources are either file paths or ``git:<rev>`` (reads
``<rev>:BENCH_DETAIL.json``).  Default: old = ``git:HEAD`` (the last
committed round's detail file), new = the working-tree
BENCH_DETAIL.json (the round being closed).  Prints a markdown table
of movers (ratio >= threshold in either direction, worst first) plus
added/removed queries, and one JSON summary line on stdout's last
line.  Sub-100 ms queries are reported but never counted as movers —
they sit inside scheduler noise, and flagging them would train people
to ignore the report.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: absolute floor below which a ratio is noise, not drift
MIN_SEC = 0.1


def load_detail(src: str) -> dict:
    if src.startswith("git:"):
        rev = src[4:] or "HEAD"
        proc = subprocess.run(
            ["git", "-C", REPO, "show", f"{rev}:BENCH_DETAIL.json"],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise SystemExit(
                f"no BENCH_DETAIL.json at {rev} ({proc.stderr.strip()})"
            )
        return json.loads(proc.stdout)
    with open(src) as f:
        return json.load(f)


def drift(old: dict, new: dict, threshold: float) -> dict:
    oq, nq = old.get("queries", {}), new.get("queries", {})
    # a metric whose recorded sampling protocol changed between the
    # two snapshots is a REBASELINE, not a mover (ADVICE r11: the
    # serve-read single-shot -> best-of-3 switch under an unchanged
    # key read as 0.25x "movement" for one round).  Only classify when
    # the OLD snapshot actually records a protocols map — a pre-r12
    # artifact with no map means "same protocol", not "changed"
    # (ADVICE r12: the missing r11 map marked engine_serve_read_7d
    # rebaselined for a round it wasn't)
    op, np_ = old.get("protocols", {}), new.get("protocols", {})
    rebaselined = sorted(
        n for n in set(oq) & set(nq)
        if "protocols" in old and op.get(n) != np_.get(n)
    )
    common = sorted((set(oq) & set(nq)) - set(rebaselined))
    rows = []
    for name in common:
        a, b = float(oq[name]), float(nq[name])
        ratio = b / a if a > 0 else float("inf")
        rows.append((name, a, b, ratio))
    movers = [
        r for r in rows
        if max(r[1], r[2]) >= MIN_SEC
        and (r[3] >= threshold or r[3] <= 1.0 / threshold)
    ]
    movers.sort(key=lambda r: max(r[3], 1.0 / r[3] if r[3] else 0), reverse=True)
    tot_old = sum(r[1] for r in rows)
    tot_new = sum(r[2] for r in rows)
    return {
        "common": len(common),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "rebaselined": rebaselined,
        "movers": movers,
        "total_old": round(tot_old, 2),
        "total_new": round(tot_new, 2),
        "total_ratio": round(tot_new / tot_old, 3) if tot_old else None,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", default="git:HEAD")
    ap.add_argument("new", nargs="?",
                    default=os.path.join(REPO, "BENCH_DETAIL.json"))
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--all", action="store_true",
                    help="print every common query, not just movers")
    args = ap.parse_args(argv)

    old, new = load_detail(args.old), load_detail(args.new)
    d = drift(old, new, args.threshold)

    print(f"# bench drift: {args.old} -> {args.new} "
          f"(threshold {args.threshold}x, floor {MIN_SEC}s)", file=sys.stderr)
    print(f"common {d['common']} queries: total {d['total_old']}s -> "
          f"{d['total_new']}s = {d['total_ratio']}x", file=sys.stderr)
    if d["added"]:
        print(f"added: {', '.join(d['added'])}", file=sys.stderr)
    if d["removed"]:
        print(f"removed: {', '.join(d['removed'])}", file=sys.stderr)
    if d["rebaselined"]:
        print(f"rebaselined (sampling protocol changed, not movers): "
              f"{', '.join(d['rebaselined'])}", file=sys.stderr)
    shown = d["movers"]
    if args.all:
        oq, nq = old.get("queries", {}), new.get("queries", {})
        shown = sorted(
            ((n, float(oq[n]), float(nq[n]),
              float(nq[n]) / float(oq[n]) if float(oq[n]) else float("inf"))
             for n in set(oq) & set(nq)),
            key=lambda r: r[3], reverse=True,
        )
    print("\n| query | old s | new s | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, a, b, ratio in shown:
        print(f"| {name} | {a:.2f} | {b:.2f} | {ratio:.2f}x |", file=sys.stderr)
    if not shown:
        print("| (no movers) | | | |", file=sys.stderr)

    print(json.dumps({
        "movers": [{"query": n, "old": a, "new": b, "ratio": round(r, 2)}
                   for n, a, b, r in d["movers"]],
        "common": d["common"],
        "total_ratio": d["total_ratio"],
        "added": d["added"], "removed": d["removed"],
        "rebaselined": d["rebaselined"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
