"""Distributed running totals: the two-pass chunked prefix sum.

A plain ``SUM() OVER (PARTITION BY key ORDER BY ts)`` funnels each
key's ENTIRE history through one task — with low-cardinality keys
(a handful of event types over years of data) that is a single-task
scan at 100 TB no matter how many executors exist.

``chunked_running_sum`` restores parallelism without changing a single
output value:

1. within-chunk pass — running sum windowed by ``(key, chunk)``
   where ``chunk`` is any monotone bucketing of the order column
   (e.g. week).  Parallelism = keys x chunks.
2. offset pass — per-(key, chunk) totals (reuses the same shuffle
   partitioning), then a running sum of PRIOR chunk totals per key.
   This window is over keys x chunks ROWS (thousands), not data rows
   (billions) — trivially small.
3. broadcast-join the offsets back and add.

Exactness: with a DECIMAL value column every step is exact decimal
arithmetic (associative), so offset + within == the sequential prefix
sum bit-for-bit, and a final double cast rounds once — identical to
the single-window plan and to the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunked_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value: Column,
    chunk: Column,
    out_col: str = "running_total",
) -> DataFrame:
    """Running total of ``value`` per key in ``order_cols`` order,
    computed with chunk-level parallelism.  ``chunk`` MUST be a
    monotone non-decreasing function of the leading order column
    (e.g. ``F.floor(ts / week)``); output rows keep all input columns
    plus ``out_col``."""
    work = df.withColumn("__chunk", chunk).withColumn("__val", value)
    w_in = (
        Window.partitionBy(*key_cols, "__chunk")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = work.withColumn("__run_in", F.sum("__val").over(w_in))
    # chunk totals: same (key, chunk) clustering as the window above,
    # so this groupBy reuses the existing shuffle partitioning
    totals = work.groupBy(*key_cols, "__chunk").agg(F.sum("__val").alias("__tot"))
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *key_cols, "__chunk", F.sum("__tot").over(w_off).alias("__off")
    )
    # NULL-SAFE join keys (code-review r9, edge corpus): a window
    # PARTITION BY treats NULL as a real group, so the single-window
    # plan this must be bit-identical to produces running totals for
    # NULL-keyed rows — a plain equi-join here silently DROPPED them
    # (NULL never equals NULL), losing rows relative to the oracle.
    # Shared helper (gapfill._ns_join) so all three window-parity
    # operators (prefix / gapfill / chunkwin) fix drift in one place.
    from .gapfill import _ns_join

    joined = _ns_join(
        within, offsets, [*key_cols, "__chunk"], broadcast=True
    )
    total = F.when(F.col("__off").isNull(), F.col("__run_in")).otherwise(
        F.col("__off") + F.col("__run_in")
    )
    return joined.withColumn(out_col, total).drop(
        "__chunk", "__val", "__run_in", "__off"
    )
