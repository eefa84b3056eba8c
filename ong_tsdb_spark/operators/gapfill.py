"""Gap filling / forward-fill / interpolation on a fixed time grid.

The reference's data model makes unwritten grid rows *invisible*
(SURVEY §1.2) — gap-fill is the inverse view users ask of a
fixed-interval store: materialize every grid tick in a range and
carry the last observation forward (or interpolate).

Spark-first and chunk-parallel end to end:

* **grid generation is chunked**: a multi-year 1 s-tick series would be
  a 10^7+-element ``sequence()`` array in a single row before explode.
  Instead each series' span is cut into ``chunk_ticks``-tick chunks
  (one small chunk-index array per series, then per-(series, chunk)
  sequences bounded at ``chunk_ticks`` elements), with a repartition on
  (series, chunk) between the two explodes so chunk generation runs in
  keys x chunks tasks;
* **the fill windows are chunked** the same way ``operators/prefix.py``
  chunks running totals: a within-(series, chunk) window does the local
  fill, per-chunk edge observations (last/first non-null, with their
  tick) are aggregated into a keys x chunks frame, a window over THAT
  tiny frame computes each chunk's carry-in (and, for interpolation,
  carry-out), and a broadcast join applies it.  Observed values are
  copied, never recomputed, so output is bit-identical to the
  single-window plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: grid ticks per generation/fill chunk — bounds every per-row array at
#: this many elements and sets fill parallelism to keys x chunks.
DEFAULT_CHUNK_TICKS = 4096


def _ns_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """NULL-SAFE equi-join on ``keys`` (code-review r9, edge corpus):
    the fill windows PARTITION BY the series columns, which treats a
    NULL series key as a real group — but the plain list-form joins
    stitching grid/carry frames back together dropped those rows
    (NULL never equals NULL), silently losing the whole NULL-keyed
    series relative to the single-window plan and every SQL oracle's
    window semantics.  ``<=>`` is still a hash-joinable equi-key, so
    the plan shape (broadcast hash join) is unchanged."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    if broadcast:
        r = F.broadcast(r)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
        cond = c if cond is None else cond & c
    return left.join(r, cond, how).drop(*[f"__r_{k}" for k in keys])


def _dedup_cells(
    df: DataFrame,
    ts_sec_col: str,
    series_cols: list[str],
    keep_cols: list[str],
    tick_seconds: int,
    tiebreak_cols: list[str] | None,
) -> DataFrame:
    """Snap to the grid; last raw-ts observation wins within a cell
    (M1's last-write-wins, applied query-side; deterministic via
    tiebreaks)."""
    t = int(tick_seconds)
    snapped = (F.col(ts_sec_col) - (F.col(ts_sec_col) % F.lit(t))).cast("long")
    ties = tiebreak_cols or []
    obs = df.select(
        *series_cols, F.col(ts_sec_col).alias("__raw_ts"), snapped.alias("__tick"),
        *ties, *keep_cols,
    )
    w_cell = Window.partitionBy(*series_cols, "__tick").orderBy(
        F.col("__raw_ts").desc(), *[F.col(c).desc() for c in ties]
    )
    return (
        obs.withColumn("__rn", F.row_number().over(w_cell))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__raw_ts", *ties)
    )


def _chunked_grid(
    obs: DataFrame, series_cols: list[str], tick_seconds: int, chunk_ticks: int
) -> tuple[DataFrame, DataFrame]:
    """Every grid tick between each series' min/max observed tick, as
    (series..., __ck, __tick) rows — arrays bounded at ``chunk_ticks``
    elements, chunks spread across tasks.  Also returns the (distinct
    by construction) chunk axis (series..., __ck) for carry windows."""
    t = int(tick_seconds)
    cb = t * int(chunk_ticks)  # chunk span in seconds; aligned to the tick
    bounds = obs.groupBy(*series_cols).agg(
        F.min("__tick").alias("__lo"), F.max("__tick").alias("__hi")
    )
    chunk_list = bounds.select(
        *series_cols,
        "__lo",
        "__hi",
        F.explode(
            F.sequence(
                F.floor(F.col("__lo") / F.lit(cb)).cast("long"),
                F.floor(F.col("__hi") / F.lit(cb)).cast("long"),
            )
        ).alias("__ck"),
    ).repartition(*series_cols, "__ck")
    grid = chunk_list.select(
        *series_cols,
        "__ck",
        F.explode(
            F.sequence(
                F.greatest(F.col("__lo"), F.col("__ck") * F.lit(cb)),
                F.least(F.col("__hi"), (F.col("__ck") + F.lit(1)) * F.lit(cb) - F.lit(t)),
                F.lit(t).cast("long"),
            )
        ).alias("__tick"),
    )
    return grid, chunk_list.select(*series_cols, "__ck")


def _obs_struct(c: str) -> Column:
    """(tick, value) carrier for a non-null observation — lexicographic
    struct min/max orders by tick first, so max = last obs in chunk,
    min = first."""
    return F.when(
        F.col(c).isNotNull(), F.struct(F.col("__tick").alias("t"), F.col(c).alias("v"))
    )


def gap_fill_ffill(
    df: DataFrame,
    ts_sec_col: str,
    series_cols: list[str],
    value_cols: list[str],
    tick_seconds: int,
    tiebreak_cols: list[str] | None = None,
    chunk_ticks: int = DEFAULT_CHUNK_TICKS,
) -> DataFrame:
    """Materialize every ``tick_seconds`` grid point between each
    series' min and max observed (snapped) timestamp, forward-filling
    value columns from the last observation at-or-before each tick.

    Chunk-parallel: within-chunk forward fill + per-chunk carry-in of
    the last prior non-null observation (computed over the tiny
    keys x chunks frame) — bit-identical to a single per-series window.
    """
    # materialized once: three consumers (bounds aggregate, the grid
    # left-join, the per-chunk edge summary) would each re-run the
    # dedup-cell shuffle+window otherwise (no ReusedExchange)
    from .dedup import materialize_for_self_join

    obs = materialize_for_self_join(
        _dedup_cells(df, ts_sec_col, series_cols, value_cols, tick_seconds, tiebreak_cols)
    )
    cb = int(tick_seconds) * int(chunk_ticks)
    grid, axis = _chunked_grid(obs, series_cols, tick_seconds, chunk_ticks)
    cells = _ns_join(grid, obs, [*series_cols, "__tick"], how="left")

    w_in = (
        Window.partitionBy(*series_cols, "__ck")
        .orderBy(F.col("__tick"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-chunk last non-null obs per column -> carry-in for later chunks
    obs_ck = obs.withColumn("__ck", F.floor(F.col("__tick") / F.lit(cb)).cast("long"))
    summ = obs_ck.groupBy(*series_cols, "__ck").agg(
        *[F.max(_obs_struct(c)).alias(f"__last_{c}") for c in value_cols]
    )
    w_prior = (
        Window.partitionBy(*series_cols)
        .orderBy("__ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = _ns_join(axis, summ, [*series_cols, "__ck"], how="left").select(
        *series_cols,
        "__ck",
        *[
            F.last(F.col(f"__last_{c}"), ignorenulls=True)
            .over(w_prior)
            .alias(f"__carry_{c}")
            for c in value_cols
        ],
    )
    filled = _ns_join(cells, carry, [*series_cols, "__ck"], broadcast=True)
    out_cols = [*series_cols, F.col("__tick").alias("tick_s")]
    for c in value_cols:
        local = F.last(F.col(c), ignorenulls=True).over(w_in)
        out_cols.append(F.coalesce(local, F.col(f"__carry_{c}.v")).alias(c))
    return filled.select(*out_cols)


def gap_fill_linear(
    df: DataFrame,
    ts_sec_col: str,
    series_cols: list[str],
    value_col: str,
    tick_seconds: int,
    tiebreak_cols: list[str] | None = None,
    chunk_ticks: int = DEFAULT_CHUNK_TICKS,
) -> DataFrame:
    """Linear interpolation on the grid: every tick between a series'
    bounds gets ``prev + (next-prev) * (t-pt)/(nt-pt)`` from the
    nearest observations on either side (exact observations pass
    through; trailing ticks after the last observation hold it).

    Chunk-parallel like :func:`gap_fill_ffill`, with BOTH a carry-in
    (last prior observation) and a carry-out (first later observation)
    per chunk so the bracketing observations cross chunk edges; the
    interpolation expression — and hence every double — is identical
    to the single-window plan."""
    from .dedup import materialize_for_self_join

    obs = materialize_for_self_join(
        _dedup_cells(df, ts_sec_col, series_cols, [value_col], tick_seconds, tiebreak_cols)
    )
    cb = int(tick_seconds) * int(chunk_ticks)
    grid, axis = _chunked_grid(obs, series_cols, tick_seconds, chunk_ticks)
    cells = _ns_join(grid, obs, [*series_cols, "__tick"], how="left")

    obs_ck = obs.withColumn("__ck", F.floor(F.col("__tick") / F.lit(cb)).cast("long"))
    summ = obs_ck.groupBy(*series_cols, "__ck").agg(
        F.max(_obs_struct(value_col)).alias("__last"),
        F.min(_obs_struct(value_col)).alias("__first"),
    )
    w_prior = (
        Window.partitionBy(*series_cols)
        .orderBy("__ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_later = (
        Window.partitionBy(*series_cols)
        .orderBy("__ck")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry = _ns_join(axis, summ, [*series_cols, "__ck"], how="left").select(
        *series_cols,
        "__ck",
        F.last("__last", ignorenulls=True).over(w_prior).alias("__cin"),
        F.first("__first", ignorenulls=True).over(w_later).alias("__cout"),
    )
    back = (
        Window.partitionBy(*series_cols, "__ck")
        .orderBy(F.col("__tick"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*series_cols, "__ck")
        .orderBy(F.col("__tick"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    marked = (
        _ns_join(cells, carry, [*series_cols, "__ck"], broadcast=True)
        .withColumn(
            "__p",
            F.coalesce(
                F.last(_obs_struct(value_col), ignorenulls=True).over(back),
                F.col("__cin"),
            ),
        )
        .withColumn(
            "__n",
            F.coalesce(
                F.first(_obs_struct(value_col), ignorenulls=True).over(fwd),
                F.col("__cout"),
            ),
        )
    )
    pv, pt = F.col("__p.v"), F.col("__p.t")
    nv, nt = F.col("__n.v"), F.col("__n.t")
    frac = (F.col("__tick") - pt).cast("double") / (nt - pt).cast("double")
    interp = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(
            nv.isNotNull() & pv.isNotNull(),
            pv.cast("double") + (nv.cast("double") - pv.cast("double")) * frac,
        )
        .otherwise(pv.cast("double"))  # trailing: hold last
    )
    return marked.select(
        *series_cols, F.col("__tick").alias("tick_s"), interp.alias(value_col)
    )
