"""Deterministic block-store hygiene for iterative operators.

Several operators iterate with eager ``localCheckpoint`` per round to
truncate lineage (BPE training, connected components, PageRank).  The
blocks backing a SUPERSEDED round live until the JVM-side Dataset is
garbage collected AND the ContextCleaner's periodic GC sweep runs
(``spark.cleaner.periodicGC.interval``, default 30 min) — so a
long-running trainer accumulates one corpus-sized copy per round in
the executors' block stores in the meantime.  That accumulation is
what OOMed the round-11 10x-Zipf BPE run at the default 1 GiB heap
(in local mode the block store and the aggregate execution memory
share one JVM).

:func:`free_checkpoint` releases a checkpoint's blocks the moment the
caller knows it is superseded, keeping live copies at exactly one per
iterative loop.  Call it ONLY on checkpoints the operator itself
created and that no returned DataFrame reads from — a local checkpoint
truncates lineage, so freeing blocks a consumer still needs is not a
recompute, it is a failure.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

__all__ = ["free_checkpoint", "CheckpointRotation"]

_log = logging.getLogger(__name__)
_warned = False


def free_checkpoint(df: DataFrame) -> None:
    """Drop the block-store partitions backing an eager
    ``localCheckpoint`` DataFrame, deterministically.

    The checkpointed RDD is reachable from the DataFrame's LogicalRDD
    plan node.  Anything unexpected (a plan that is not a bare
    checkpoint, an already-cleaned RDD) degrades to the old
    GC-eventually behavior rather than failing the caller — but is
    LOGGED once per process (ADVICE r12): this path leans on private
    Spark internals, and a Spark upgrade silently disabling all block
    freeing would otherwise reintroduce the r11 OOM with no signal
    outside the test suite.
    """
    global _warned
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception as ex:  # noqa: BLE001 — degrade, but observably
        if not _warned:
            _warned = True
            _log.warning(
                "free_checkpoint: could not release checkpoint blocks "
                "(%s: %s); superseded copies will persist until the "
                "periodic ContextCleaner GC — iterative operators lose "
                "the one-live-copy memory bound. Further occurrences "
                "are silent.", type(ex).__name__, ex,
            )


class CheckpointRotation:
    """Bounded backlog of superseded checkpoints (round-13 rotation
    policy, VERDICT r12 #3).

    Freeing every superseded checkpoint the moment it is replaced
    measured ~9% wall overhead on the 10x pagerank A/B (BENCH.md
    round-13 row) — the unpersist call itself is ~1.5 ms, but the
    asynchronous block removal contends with the next rounds' compute
    in a shared local JVM.  Deferring frees behind a small backlog
    removes every mid-loop free from short runs (a 6-iteration
    PageRank supersedes at most one checkpoint) while a long run's
    live superseded copies stay bounded at ``backlog``; ``drain()`` at
    the call boundary restores the zero-superseded-copies-after-return
    contract either way.  Operators whose per-round copy is
    corpus-sized (the BPE trainer) keep the strict one-live-copy
    rotation instead — there the memory bound is worth the
    contention."""

    def __init__(self, backlog: int = 2):
        self.backlog = max(0, int(backlog))
        self._q: list[DataFrame] = []

    def supersede(self, df: DataFrame) -> None:
        """Register a checkpoint no consumer reads anymore; frees the
        oldest entries once more than ``backlog`` accumulate."""
        self._q.append(df)
        while len(self._q) > self.backlog:
            free_checkpoint(self._q.pop(0))

    def drain(self) -> None:
        """Free every backlog entry — call at the operator boundary
        (success or error) so nothing outlives the call."""
        while self._q:
            free_checkpoint(self._q.pop(0))
