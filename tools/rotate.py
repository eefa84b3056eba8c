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
import ast
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


def _resolve_import_base(base: str, names: list[str]) -> set[str]:
    """Map an import base path (package dir or module path, repo-relative,
    no extension) plus its imported names to existing repo files."""
    found: set[str] = set()
    if os.path.exists(os.path.join(REPO, base + ".py")):
        found.add(base + ".py")
    init = os.path.join(base, "__init__.py")
    if os.path.exists(os.path.join(REPO, init)):
        found.add(init.replace(os.sep, "/"))
    for name in names:
        sub = os.path.join(base, f"{name}.py")
        if os.path.exists(os.path.join(REPO, sub)):
            found.add(sub.replace(os.sep, "/"))
    return found


def module_import_graph() -> dict[str, set[str]]:
    """repo-relative ``ong_tsdb_spark`` .py file -> the intra-package
    files it imports (ast-parsed: relative AND absolute forms, module-
    and name-level).  The graph powers the transitive closure in
    :func:`entry_impl_files` — VERDICT r9 #1: the one-level scan let
    ``plans/curation.py``'s dependents (dedup/similarity/text edits)
    slip past the code-change ranking."""
    graph: dict[str, set[str]] = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, "ong_tsdb_spark")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), REPO).replace(os.sep, "/")
            try:
                tree = ast.parse(open(os.path.join(REPO, rel)).read())
            except (OSError, SyntaxError):
                graph[rel] = set()
                continue
            pkg_dir = os.path.dirname(rel)
            deps: set[str] = set()
            for node in ast.walk(tree):
                if isinstance(node, ast.ImportFrom):
                    if node.level:  # relative: level 1 = same package dir
                        base_dir = pkg_dir
                        for _ in range(node.level - 1):
                            base_dir = os.path.dirname(base_dir)
                        mod = node.module or ""
                    elif node.module and node.module.split(".")[0] == "ong_tsdb_spark":
                        base_dir, mod = "", node.module
                    else:
                        continue
                    base = (
                        os.path.join(base_dir, *mod.split(".")) if mod else base_dir
                    )
                    deps |= _resolve_import_base(
                        base, [a.name for a in node.names]
                    )
                elif isinstance(node, ast.Import):
                    for a in node.names:
                        if a.name.split(".")[0] == "ong_tsdb_spark":
                            deps |= _resolve_import_base(
                                os.path.join(*a.name.split(".")), []
                            )
            graph[rel] = deps - {rel}
    return graph


def transitive_closure(seeds: set[str], graph: dict[str, set[str]]) -> set[str]:
    """Seeds plus every package file reachable through the import graph
    (full depth, not one level — a ``xxh64_sql.py`` edit must flag the
    dedup entries that reach it only through ``dedup.py``)."""
    out = set(seeds)
    frontier = list(seeds)
    while frontier:
        nxt = frontier.pop()
        for dep in graph.get(nxt, ()):
            if dep not in out:
                out.add(dep)
                frontier.append(dep)
    return out


def chunk_parts(src: str, normalize: bool = True) -> dict[str, dict[str, str]]:
    """fn name -> {member name -> source segment} for every top-level
    function: the function itself (decorator included) plus every
    module-level member (def/class/constant) it transitively references
    as an actual ``ast.Name`` — so an edit to a shared helper (``load``,
    a ``_*_sql`` builder, a packing CTE factory, ``_VALID_TICKS``)
    invalidates the evidence of every entry that uses it, not just
    entries whose own block changed (VERDICT r9 #1: module-level
    helpers like ``_recall_vs_brute`` were invisible to the
    per-@register chunk diff).  References come from the AST, not a
    text match, so prose words in comments/SQL never drag in unrelated
    helpers.

    ``normalize=False`` keeps raw newlines — required by the
    line-anchored import scan in :func:`entry_impl_files`."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}
    lines = src.splitlines(keepends=True)
    seg: dict[str, str] = {}
    refs: dict[str, set[str]] = {}
    fn_names: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
            if not isinstance(node, ast.ClassDef):
                fn_names.add(node.name)
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        else:
            continue
        start = node.lineno
        if getattr(node, "decorator_list", None):
            start = min(d.lineno for d in node.decorator_list)
        text = "".join(lines[start - 1 : node.end_lineno])
        used = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for nm in names:
            seg[nm] = text
            refs[nm] = used
    for nm in refs:
        refs[nm] = (refs[nm] & set(seg)) - {nm}

    def norm(t: str) -> str:
        return re.sub(r"\s+", " ", t).strip() if normalize else t

    out: dict[str, dict[str, str]] = {}
    for fname in fn_names:
        seen: set[str] = set()
        frontier = [fname]
        while frontier:
            for ref in refs.get(frontier.pop(), ()):
                if ref not in seen and ref != fname:
                    seen.add(ref)
                    frontier.append(ref)
        out[fname] = {n: norm(seg[n]) for n in seen | {fname}}
    return out


def effective_chunks(src: str, normalize: bool = True) -> dict[str, str]:
    """Flattened view of :func:`chunk_parts`: fn name -> its own segment
    plus the transitively-referenced member segments joined in
    sorted-name order (deterministic)."""
    joiner = " || " if normalize else "\n"
    return {
        fname: joiner.join(
            [parts[fname]] + [parts[n] for n in sorted(set(parts) - {fname})]
        )
        for fname, parts in chunk_parts(src, normalize).items()
    }


def _member_hash(text: str) -> str:
    import hashlib

    return hashlib.md5(text.encode()).hexdigest()[:12]


#: (member name, md5(old normalized segment), md5(new normalized
#: segment)) transitions reviewed as EVIDENCE-NEUTRAL: the edit cannot
#: change any result produced under the sessions that generated driver
#: evidence, so it does not invalidate prior greens.  Hash-pinned both
#: sides — any further edit to the member breaks the pair and re-flags
#: every dependent entry.  Keep this list SHORT and justified.
WAIVED_MEMBER_DIFFS: dict[tuple[str, str, str], str] = {
    # load(): the r9 sizeOfNull session pin (spark.sql.legacy.sizeOfNull
    # = false).  Under the ANSI-default sessions every driver round
    # runs, size(NULL) is already NULL, so the pin is a no-op there; it
    # changes behavior only for hostile ANSI-off sessions, which never
    # produced driver evidence.  Without this waiver the pin marks all
    # 62 pre-r9 entries code-changed at once and the 50-slot head
    # cannot clear the backlog in one round (r10).
    ("load", "c8d6b877ed8f", "ea15639101b7"): (
        "r9 sizeOfNull pin is a no-op under ANSI-default driver sessions"
    ),
}


def _changed_members(
    old_parts: dict[str, dict[str, str]],
    new_parts: dict[str, dict[str, str]],
    fname: str,
) -> list[str]:
    """Members of ``fname``'s effective chunk that differ between two
    file versions, minus reviewed-neutral waivers.  A member added,
    removed, or edited all count — so does the fn appearing/vanishing."""
    op, np = old_parts.get(fname), new_parts.get(fname)
    if op is None or np is None:
        return [fname] if op != np else []
    changed = []
    for m in set(op) | set(np):
        a, b = op.get(m), np.get(m)
        if a == b:
            continue
        if (
            a is not None
            and b is not None
            and (m, _member_hash(a), _member_hash(b)) in WAIVED_MEMBER_DIFFS
        ):
            continue
        changed.append(m)
    return sorted(changed)


# a registry READ (dispatch into another entry's plan), as opposed to
# the write inside the register() factory itself
_REGISTRY_DISPATCH_RE = re.compile(r"REGISTRY\[[^\]]+\]\s*\.\s*fn")


def entry_impl_files() -> dict[str, set[str]]:
    """entry name -> repo-relative package files whose change invalidates
    the entry's driver evidence: the files its EFFECTIVE chunk (own
    @register block + transitively-referenced module helpers) touches
    via top-level aliases, inline `from .x import y` statements, or the
    shared epoch helpers — EXPANDED to the transitive import closure
    over ``ong_tsdb_spark/`` (VERDICT r9 #1: the one-level scan let
    ``curation.py``'s re-exports hide dedup/similarity/text edits).

    ``REGISTRY[...].fn`` dispatch (the recall gauges) is resolved by
    string literal: the dispatching entry inherits the dispatched
    entries' file sets; an unresolvable dispatch is unknowable ->
    conservative (the full alias-file closure), like the missing-chunk
    fallback.  An entry that maps to ZERO files after all that is
    genuinely self-contained DataFrame code — its evidence is guarded
    by the effective-chunk diff in :func:`changed_since_green`, which
    sees every helper it calls."""
    import __spark_entry__  # noqa: F401 — ensures package import path
    from ong_tsdb_spark.entry_queries import REGISTRY

    graph = module_import_graph()
    conservative = transitive_closure(set(_ALIAS_FILES.values()), graph)
    src = open(
        os.path.join(REPO, "ong_tsdb_spark", "entry_queries.py")
    ).read()
    eff = effective_chunks(src, normalize=False)

    def scan(text: str) -> set[str]:
        files: set[str] = set()
        for alias, path in _ALIAS_FILES.items():
            if re.search(rf"\b{alias}\.\w", text):
                files.add(path)
        for m in _INLINE_IMPORT_RE.finditer(text):
            files.update(_resolve_module(m.group(1), m.group(2)))
        if re.search(
            r"\b(_us|_sec|_ns|nan_sum|epoch_us|epoch_sec|epoch_ns)\(", text
        ):
            files.add(_TS_HELPER_FILE)
        return files

    direct: dict[str, set[str] | None] = {}
    for name, q in REGISTRY.items():
        text = eff.get(q.fn.__name__)
        direct[name] = scan(text) if text is not None else None

    out: dict[str, set[str]] = {}
    for name, q in REGISTRY.items():
        if direct[name] is None:
            out[name] = conservative  # chunk not found -> unknowable
            continue
        files = set(direct[name])
        text = eff[q.fn.__name__]
        if _REGISTRY_DISPATCH_RE.search(text):
            hits = [
                k for k in REGISTRY
                if k != name and re.search(rf"""["']{re.escape(k)}["']""", text)
            ]
            if hits and all(direct[k] is not None for k in hits):
                for k in hits:
                    files |= direct[k]  # type: ignore[arg-type]
            else:
                out[name] = conservative
                continue
        out[name] = transitive_closure(files, graph)
    return out


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
    chunk_cache: dict[int, dict[str, dict[str, str]]] = {}
    eq_rel = "ong_tsdb_spark/entry_queries.py"
    # compare the two round-close COMMITS (not the working tree) so the
    # plan is reproducible over its planned-on window even while the
    # current round edits entry bodies
    try:
        head_chunks = (
            chunk_parts(_git("show", f"{upper}:{eq_rel}")) if upper else {}
        )
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
            chunk_cache[rnd] = chunk_parts(old_src)
        reasons = sorted(impl.get(name, set()) & diff_cache[rnd])
        fname = q.fn.__name__
        members = _changed_members(chunk_cache[rnd], head_chunks, fname)
        if members:
            reasons.append(f"{eq_rel}:{fname}[{','.join(members)}]")
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
