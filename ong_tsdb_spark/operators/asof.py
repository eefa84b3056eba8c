"""As-of (backward) join — the canonical time-series operator Spark
lacks natively, built as a composition of existing DataFrame ops (no
UDF, no crossJoin):

    union(tagged left, tagged right)
      -> window last_value(ignorenulls) over (by, ts, side)
      -> keep left rows

Each left row picks up the latest right row with ``right.ts <=
left.ts`` within the same ``by`` key.  Cost: ONE shuffle+sort per by
key over left+right combined — the same complexity class as a
sort-merge join, and embarrassingly scalable because the window is
per-key.  (Contrast: the naive range-join formulation explodes to
|left| x |right| pairs per key before filtering.)

The reference never joins datasets (SURVEY §2.3); this is part of the
"natural extension" surface exposed because cross-sensor alignment is
the first thing users of a fixed-grid TSDB ask for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right
    row at or before its timestamp, matched on ``by`` keys.

    left/right must share ``ts_col`` (numeric epoch) and ``by``.
    ``value_cols`` defaults to every right column that is neither the
    timestamp nor a key.  ``tolerance`` (same unit as ts_col) drops
    matches older than ``left.ts - tolerance``.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != ts_col]

    ts_type = right.schema[ts_col].dataType
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(ts_type).alias("__r_ts"),
    )
    # a NULL-ts right row must not participate: it sorts to the window
    # head (nulls-first) where last(ignorenulls) picks up its VALUE
    # columns while __f_ts (also null there) keeps the previous match's
    # timestamp — left rows would report values from a row that never
    # matched, stamped with another row's ts (code-review r9).  DuckDB's
    # ASOF JOIN likewise never matches a NULL-ts build row.  NULL
    # BY-KEYS on the right are excluded for the same reason: the
    # window PARTITION BY would group NULL keys and hand NULL-key left
    # rows a "match" that no SQL equi-condition (NULL never equals
    # NULL) would produce — such left rows must come back unmatched
    # (code-review r9, second pass).
    right = right.filter(F.col(ts_col).isNotNull())
    for c in by:
        right = right.filter(F.col(c).isNotNull())
    r_tagged = right.select(
        *[
            F.col(c) if c in (by + [ts_col]) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias("__f_ts"),
    )
    out = filled.filter(F.col("__side") == 1)
    matched: Column = F.col("__f_ts").isNotNull()
    if tolerance is not None:
        matched = matched & (
            F.col(ts_col).cast("double") - F.col("__f_ts").cast("double") <= tolerance
        )
    sel = [F.col(c) for c in lcols]
    for c in value_cols:
        sel.append(F.when(matched, F.col(f"__f_{c}")).alias(f"{c}{suffix}"))
    sel.append(F.when(matched, F.col("__f_ts")).alias(f"{ts_col}{suffix}"))
    return out.select(*sel)
