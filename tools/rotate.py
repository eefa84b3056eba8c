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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "# --- TAIL_ROTATION BEGIN (managed by tools/rotate.py) ---"
END = "# --- TAIL_ROTATION END ---"

# package-relative paths of modules referenced by entry_queries bodies
# via the top-level aliases imported at entry_queries.py:34-37
_ALIAS_FILES = {
    "dedup": "ong_tsdb_spark/operators/dedup.py",
    "downsample": "ong_tsdb_spark/operators/downsample.py",
    "similarity": "ong_tsdb_spark/operators/similarity.py",
    "text": "ong_tsdb_spark/operators/text.py",
    "tokenized_shards": "ong_tsdb_spark/plans/tokenized_shards.py",
    "influx_src": "ong_tsdb_spark/sources/influx.py",
}
# schema-adaptive epoch helpers every ts_* body leans on
_TS_HELPER_FILE = "ong_tsdb_spark/functions/timeseries.py"
_INLINE_IMPORT_RE = re.compile(
    # one import statement per match, names bounded to the line (or the
    # parenthesized group) so consecutive imports can't swallow each
    # other's `from` keyword — names like `[\w,\s]+` are greedy across
    # newlines and would eat the next statement's keyword, silently
    # dropping its module from the impl-file map
    r"(?m)^\s*from\s+(\.[.\w]*|ong_tsdb_spark[.\w]*)\s+import\s+"
    r"(\([^)]*\)|[^\n]+)"
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def round_close_commit(rnd: int) -> str | None:
    """Commit that ADDED CORRECTNESS_r0N.json — the snapshot the round-N
    driver evidence was gathered against (the driver commits evidence at
    round close, before any round-N+1 code lands)."""
    try:
        out = _git(
            "log", "--diff-filter=A", "--format=%H", "--",
            f"CORRECTNESS_r{rnd:02d}.json",
        ).strip().splitlines()
    except subprocess.CalledProcessError:
        return None
    return out[-1] if out else None


def _resolve_module(dotted: str, names: str) -> list[str]:
    """`from <dotted> import <names>` -> repo-relative candidate files."""
    names = names.strip().strip("()")
    dotted = dotted.replace("ong_tsdb_spark", "", 1).lstrip(".")
    base = os.path.join("ong_tsdb_spark", *dotted.split(".")) if dotted else "ong_tsdb_spark"
    found = []
    mod_file = base + ".py"
    if os.path.exists(os.path.join(REPO, mod_file)):
        found.append(mod_file)
    for name in re.split(r"[,\s]+", names.strip()):
        sub = os.path.join(base, f"{name}.py")
        if name and os.path.exists(os.path.join(REPO, sub)):
            found.append(sub)
    return found


def entry_impl_files() -> dict[str, set[str]]:
    """entry name -> repo-relative operator/plan files its body touches
    (top-level aliases + inline `from .x import y` statements + the
    shared epoch helpers).  entry_queries.py itself is handled
    separately via a per-function body diff, because the managed
    rotation block mutates every round."""
    import inspect

    import __spark_entry__  # noqa: F401 — ensures package import path
    from ong_tsdb_spark.entry_queries import REGISTRY

    out: dict[str, set[str]] = {}
    for name, q in REGISTRY.items():
        try:
            src = inspect.getsource(q.fn)
        except OSError:
            out[name] = set(_ALIAS_FILES.values())  # unknowable -> conservative
            continue
        files: set[str] = set()
        for alias, path in _ALIAS_FILES.items():
            if re.search(rf"\b{alias}\.\w", src):
                files.add(path)
        for m in _INLINE_IMPORT_RE.finditer(src):
            files.update(_resolve_module(m.group(1), m.group(2)))
        if re.search(r"\b(_us|_sec|_ns|nan_sum|epoch_us|epoch_sec|epoch_ns)\(", src):
            files.add(_TS_HELPER_FILE)
        out[name] = files
    return out


def _fn_chunks(src: str) -> dict[str, str]:
    """Split an entry_queries.py source into per-@register chunks keyed
    by the registered function's name (decorator + oracle SQL + body)."""
    chunks: dict[str, str] = {}
    parts = re.split(r"(?m)^(?=@register\()", src)
    for part in parts[1:]:
        m = re.search(r"(?m)^def (\w+)\(", part)
        if not m:
            continue
        # keep decorator + first def block only: cut at the next col-0 def
        tail = part[m.start():]
        nxt = re.search(r"(?m)^(?=def |# ==|_\w+ =)", tail[1:])
        fn_src = part[: m.start()] + (tail[: nxt.start() + 1] if nxt else tail)
        chunks[m.group(1)] = re.sub(r"\s+", " ", fn_src).strip()
    return chunks


def changed_since_green(
    green: dict[str, int], planned_on: int, code_upper: str | None = None
) -> dict[str, list[str]]:
    """entry -> evidence-invalidating changes: impl files (or the
    entry's own @register block in entry_queries.py) that differ
    between the close commit of the entry's last-green round and the
    close commit of ``planned_on``.  Deterministic over committed
    history, so the committed rotation stays reproducible (the test
    re-plans over the same planned-on window).  VERDICT r8 #7.

    ``code_upper`` (a commit sha) extends the diff window past the
    ``planned_on`` close commit to the CURRENT round's tip — without
    it, edits landed mid-round ride on same-round driver green until
    the NEXT rotation notices (the exact one-round lag the r8 verdict
    called out on corpus_epoch_mix).  With it, entries green in
    ``planned_on`` itself are also eligible: their window is
    close(planned_on)..code_upper.  The sha is recorded in the
    planned-on marker so the invariants test replans identically."""
    import inspect

    import __spark_entry__  # noqa: F401
    from ong_tsdb_spark.entry_queries import REGISTRY

    close: dict[int, str | None] = {}
    for rnd in set(green.values()) | {planned_on}:
        close[rnd] = round_close_commit(rnd)
    if code_upper is not None:
        upper = _git("rev-parse", code_upper).strip()
    else:
        upper = close.get(planned_on)
    impl = entry_impl_files()
    # one git-diff + one old-source fetch per distinct stale round
    diff_cache: dict[int, set[str]] = {}
    chunk_cache: dict[int, dict[str, str]] = {}
    eq_rel = "ong_tsdb_spark/entry_queries.py"
    # compare the two round-close COMMITS (not the working tree) so the
    # plan is reproducible over its planned-on window even while the
    # current round edits entry bodies
    try:
        head_chunks = _fn_chunks(_git("show", f"{upper}:{eq_rel}")) if upper else {}
    except subprocess.CalledProcessError:
        head_chunks = {}
    out: dict[str, list[str]] = {}
    # without a code_upper the window tops out at close(planned_on),
    # so same-round-green entries have a zero-length window — skip them
    newest_eligible = planned_on if code_upper is not None else planned_on - 1
    for name, q in REGISTRY.items():
        rnd = green.get(name)
        if rnd is None or rnd > newest_eligible:
            continue
        lower = close.get(rnd)
        if lower is None or upper is None or lower == upper:
            continue
        if rnd not in diff_cache:
            diff_cache[rnd] = set(
                _git("diff", "--name-only", f"{lower}..{upper}").splitlines()
            )
            try:
                old_src = _git("show", f"{lower}:{eq_rel}")
            except subprocess.CalledProcessError:
                old_src = ""
            chunk_cache[rnd] = _fn_chunks(old_src)
        reasons = sorted(impl.get(name, set()) & diff_cache[rnd])
        fname = q.fn.__name__
        if chunk_cache[rnd].get(fname) != head_chunks.get(fname):
            reasons.append(f"{eq_rel}:{fname}")
        if reasons:
            out[name] = reasons
    return out


def rank_entries(
    names: list[str],
    green: dict[str, int],
    changed: dict[str, list[str]] | None = None,
) -> list[str]:
    """Staleness order with the code-change penalty: never-proven
    first, then everything by EFFECTIVE staleness — a code-changed
    entry ranks 1.5 rounds staler than its last green round.  The
    half-step encodes both required orderings at once: a code-touched
    rN-green entry outranks an untouched r(N-1)-green one (VERDICT r8
    #7: post-green edits never ride on stale driver rows), while an
    UNTOUCHED entry two rounds stale still outranks a code-touched
    latest-round entry (the histogram bound: nothing drifts past the
    documented worst-case cadence just because a busy round touched
    many modules — the flat two-class scheme pushed untouched r6
    entries out of a head with 50 code-changed candidates)."""
    changed = changed or {}
    order = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            float("-inf") if n not in green
            else green[n] - 1.5 if n in changed
            else float(green[n]),
            green.get(n, 0),
            order[n],
        ),
    )


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
    head_size: int,
    max_round: int | None = None,
    code_upper: str | None = None,
) -> tuple[list[str], list[str], dict[str, int]]:
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    green = last_green_rounds(max_round)
    planned_on = max(green.values(), default=0)
    try:
        changed = changed_since_green(green, planned_on, code_upper)
    except Exception as ex:  # noqa: BLE001 — degrade to staleness-only
        print(f"WARNING: code-change scan unavailable ({ex}); "
              "ranking by staleness only", file=sys.stderr)
        changed = {}
    ranked = rank_entries(names, green, changed)
    head = ranked[:head_size]
    # tail: most-recently-proven LAST (nearest the window boundary)
    tail = [n for n in ranked if n not in set(head)]
    plan.last_changed = changed  # for main()'s report
    return head, tail, green


PLANNED_ON_RE = re.compile(
    r"^# planned-on: r(\d+)\.\.r(\d+)(?: @ ([0-9a-f]{7,40}))?$", re.M
)


def read_planned_on(path: str | None = None) -> int | None:
    """Return the upper round of the committed rotation's evidence
    window (the ``# planned-on: rN..rM [@ sha]`` marker inside the
    managed block), or None for a pre-marker file."""
    if path is None:
        path = os.path.join(REPO, "ong_tsdb_spark", "entry_queries.py")
    m = PLANNED_ON_RE.search(open(path).read())
    return int(m.group(2)) if m else None


def read_code_upper(path: str | None = None) -> str | None:
    """The commit sha the committed rotation's code-change scan was
    planned against (the ``@ sha`` marker suffix), or None for a
    marker written before the mid-round scan existed."""
    if path is None:
        path = os.path.join(REPO, "ong_tsdb_spark", "entry_queries.py")
    m = PLANNED_ON_RE.search(open(path).read())
    return m.group(3) if m else None


def rewrite_tail(
    tail: list[str],
    path: str | None = None,
    planned_on: int | None = None,
    code_upper: str | None = None,
) -> None:
    if path is None:
        path = os.path.join(REPO, "ong_tsdb_spark", "entry_queries.py")
    src = open(path).read()
    if BEGIN not in src or END not in src:
        raise SystemExit("rotation markers not found in entry_queries.py")
    if planned_on is None:
        planned_on = max(last_green_rounds().values(), default=0)
    marker = f"# planned-on: r01..r{planned_on:02d}"
    if code_upper:
        marker += f" @ {code_upper}"
    lines = [BEGIN, marker, "_TAIL_ROTATION = ["]
    body = "\n".join(lines + [f'    "{n}",' for n in tail] + ["]", END])
    pre, rest = src.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    open(path, "w").write(pre + body + post)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--head-size", type=int, default=50)
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--code-upper",
        default="HEAD",
        help="commit bounding the code-change scan (recorded in the "
        "planned-on marker; pass an empty string for the legacy "
        "close-commit-only scan)",
    )
    args = ap.parse_args(argv)

    code_upper = (
        _git("rev-parse", "--short=12", args.code_upper).strip()
        if args.code_upper
        else None
    )
    head, tail, green = plan(args.head_size, code_upper=code_upper)
    changed = getattr(plan, "last_changed", {})
    latest = max(green.values(), default=0)
    print(f"registry={len(head) + len(tail)} head={len(head)} tail={len(tail)} "
          f"latest_round=r{latest:02d}")
    # staleness histogram over the whole registry (VERDICT r8 #6): the
    # driver proves <=50 entries/round, so with >100 entries worst-case
    # cadence is ceil(registry/50) rounds — watch it here every run.
    hist: dict[str, int] = {}
    for n in head + tail:
        key = f"r{green[n]:02d}" if n in green else "never"
        hist[key] = hist.get(key, 0) + 1
    print("staleness histogram: "
          + " ".join(f"{k}={hist[k]}" for k in sorted(hist)))
    for n in head:
        why = (
            "never-proven" if n not in green
            else f"CODE-CHANGED after r{green[n]:02d} green ({', '.join(changed[n])})"
            if n in changed
            else f"stale-since-r{green[n]:02d}"
        )
        print(f"  head: {n} ({why})")
    over = [n for n in tail if green.get(n, 0) < latest - 1]
    if over:
        print(f"WARNING: {len(over)} tail entries will be >2 rounds stale "
              f"next round: {over}")
    if args.write:
        rewrite_tail(tail, planned_on=latest, code_upper=code_upper)
        at = f" @ {code_upper}" if code_upper else ""
        print(f"wrote _TAIL_ROTATION (planned-on r01..r{latest:02d}{at}; run "
              "pytest tests/test_entry.py -k invariants to confirm)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
