"""Gap filling / forward-fill on a fixed time grid.

The reference's data model makes unwritten grid rows *invisible*
(SURVEY §1.2) — gap-fill is the inverse view users ask of a
fixed-interval store: materialize every grid tick in a range and
carry the last observation forward.

Spark-first construction, fully scalable:
* grid generation is ``sequence()`` per series **bounded by that
  series' own span** (explode of a per-key array — no driver loop,
  no global cross join);
* forward fill is ``last(value, ignorenulls)`` over a per-series
  window — one shuffle+sort per series key, the same cost class as
  the as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_ffill(
    df: DataFrame,
    ts_sec_col: str,
    series_cols: list[str],
    value_cols: list[str],
    tick_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize every ``tick_seconds`` grid point between each
    series' min and max observed (snapped) timestamp, forward-filling
    value columns from the last observation at-or-before each tick.

    Input timestamps are snapped down to the grid first (reference
    getpos truncation); if several rows snap to one cell the latest
    (by raw ts) wins — M1's last-write-wins, applied query-side.
    """
    t = int(tick_seconds)
    snapped = (F.col(ts_sec_col) - (F.col(ts_sec_col) % F.lit(t))).cast("long")
    ties = tiebreak_cols or []
    obs = df.select(
        *series_cols, F.col(ts_sec_col).alias("__raw_ts"), snapped.alias("__tick"),
        *ties, *value_cols,
    )
    # last-wins within a grid cell (deterministic via tiebreaks)
    w_cell = Window.partitionBy(*series_cols, "__tick").orderBy(
        F.col("__raw_ts").desc(), *[F.col(c).desc() for c in ties]
    )
    obs = (
        obs.withColumn("__rn", F.row_number().over(w_cell))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__raw_ts", *ties)
    )
    # per-series grid: sequence(min_tick, max_tick, t) exploded
    bounds = obs.groupBy(*series_cols).agg(
        F.min("__tick").alias("__lo"), F.max("__tick").alias("__hi")
    )
    grid = bounds.select(
        *series_cols,
        F.explode_outer(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(t).cast("long"))
        ).alias("__tick"),
    )
    joined = grid.join(obs, on=[*series_cols, "__tick"], how="left")
    w_ffill = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("__tick"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [*series_cols, F.col("__tick").alias("tick_s")]
    for c in value_cols:
        out_cols.append(F.last(F.col(c), ignorenulls=True).over(w_ffill).alias(c))
    return joined.select(*out_cols)
