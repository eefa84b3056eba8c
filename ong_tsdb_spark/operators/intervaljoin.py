"""Interval (range-overlap) join: events matched to the intervals
containing them — the time-series join Spark's planner turns into a
broadcast-nested-loop/cartesian when written as
``l.ts BETWEEN r.start AND r.end``.

Technique (the standard "bin join"): bucket time into fixed chunks,
explode every interval to the chunks it covers, equi-join events to
interval-chunks on the chunk id, then apply the exact range predicate
as a post-filter.  The cross product collapses to
``events x intervals-overlapping-their-chunk``; the explode fan-out is
``ceil(interval_len / chunk) + 1`` rows per interval, so pick the
chunk near the TYPICAL interval length.

At 100 TB: the only shuffle is the (chunk-keyed) equi-join, which
co-partitions with chunk-bucketed storage; no broadcast requirement on
either side, no nested loop.  All arithmetic is epoch-us integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600 * 1_000_000


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    chunk_us: int = HOUR_US,
    how: str = "inner",
) -> DataFrame:
    """Join each event row to every interval row with
    ``start <= ts <= end`` (inclusive both ends).  Returns the event
    columns plus the interval columns.

    ``how='inner'`` (default) emits matches only; ``how='left'`` keeps
    unmatched events with null interval columns (the as-of-style
    enrichment shape).  Column names must not collide across the two
    inputs (rename before joining, as with any equi-join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    chunk = F.lit(int(chunk_us))
    ev = events.withColumn("__chunk", F.floor(F.col(ts_col) / chunk).cast("long"))
    # explode each interval to the chunk range it covers — sequence is
    # inclusive on both ends, matching floor(start) .. floor(end).
    # Empty intervals (end < start) are dropped FIRST: they can match
    # nothing, and F.sequence with start > stop would otherwise count
    # DOWN, exploding one corrupt row into every chunk between the
    # bounds (an epoch-us start with an unset end = ~half a billion
    # rows, OOMing the task before the post-predicate could filter).
    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / chunk).cast("long"),
                F.floor(F.col(end_col) / chunk).cast("long"),
            )
        ),
    )
    pred = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if how == "inner":
        return ev.join(iv, on="__chunk").filter(pred).drop("__chunk")
    # left: the range predicate must ride the JOIN condition, not a
    # post-filter — filtering after a left join would drop unmatched
    # events (whose interval columns are null) along with false pairs
    joined = ev.join(iv, on=[ev["__chunk"] == iv["__chunk"], pred], how="left")
    return joined.drop(iv["__chunk"]).drop(ev["__chunk"])
