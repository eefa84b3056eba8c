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


def gap_fill_linear(
    df: DataFrame,
    ts_sec_col: str,
    series_cols: list[str],
    value_col: str,
    tick_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Linear interpolation on the grid: every tick between a series'
    bounds gets ``prev + (next-prev) * (t-pt)/(nt-pt)`` from the
    nearest observations on either side (exact observations pass
    through; trailing ticks after the last observation hold it).

    Same one-shuffle-per-series window structure as forward fill; the
    interpolation itself is per-row arithmetic (deterministic — one
    expression evaluation order)."""
    t = int(tick_seconds)
    snapped = (F.col(ts_sec_col) - (F.col(ts_sec_col) % F.lit(t))).cast("long")
    ties = tiebreak_cols or []
    obs = df.select(
        *series_cols, F.col(ts_sec_col).alias("__raw_ts"), snapped.alias("__tick"),
        *ties, F.col(value_col),
    )
    w_cell = Window.partitionBy(*series_cols, "__tick").orderBy(
        F.col("__raw_ts").desc(), *[F.col(c).desc() for c in ties]
    )
    obs = (
        obs.withColumn("__rn", F.row_number().over(w_cell))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__raw_ts", *ties)
    )
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
    back = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("__tick"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("__tick"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    marked = joined.select(
        *series_cols,
        F.col("__tick"),
        v,
        F.last(v, ignorenulls=True).over(back).alias("__pv"),
        F.last(F.when(v.isNotNull(), F.col("__tick")), ignorenulls=True)
        .over(back)
        .alias("__pt"),
        F.first(v, ignorenulls=True).over(fwd).alias("__nv"),
        F.first(F.when(v.isNotNull(), F.col("__tick")), ignorenulls=True)
        .over(fwd)
        .alias("__nt"),
    )
    frac = (F.col("__tick") - F.col("__pt")).cast("double") / (
        F.col("__nt") - F.col("__pt")
    ).cast("double")
    interp = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(
            F.col("__nv").isNotNull() & F.col("__pv").isNotNull(),
            F.col("__pv").cast("double")
            + (F.col("__nv").cast("double") - F.col("__pv").cast("double")) * frac,
        )
        .otherwise(F.col("__pv").cast("double"))  # trailing: hold last
    )
    return marked.select(
        *series_cols, F.col("__tick").alias("tick_s"), interp.alias(value_col)
    )
