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

from pyspark.sql import DataFrame

__all__ = ["free_checkpoint"]


def free_checkpoint(df: DataFrame) -> None:
    """Drop the block-store partitions backing an eager
    ``localCheckpoint`` DataFrame, deterministically.

    The checkpointed RDD is reachable from the DataFrame's LogicalRDD
    plan node.  Anything unexpected (a plan that is not a bare
    checkpoint, an already-cleaned RDD) degrades to the old
    GC-eventually behavior rather than failing the caller.
    """
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:
        pass
