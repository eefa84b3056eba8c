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

__all__ = ["free_checkpoint"]

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
