"""Materialized rollups — continuous-aggregate-style downsampled
sensors (the "hypertable rollup" pattern).

The reference only downsamples at query time (W1); at 100 TB the
standard play is to materialize coarse grids once and serve dashboard
ranges from them.  A rollup is just another sensor (same storage,
partitioning, read path), derived by a windowed aggregation of the
source — so every engine feature (pruned reads, downsampled reads,
verify, compaction) works on rollups for free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..engine import PART_COL, TS_COL, OngTsdbSpark
from ..grid import Grid
from ..pandas_edge import flatten_metrics

#: supported per-metric aggregations — factories over (clean_value,
#: ts).  'first'/'last' are TIME-ordered via min/max over a (ts,
#: value) struct (lexicographic; ts unique per row), NOT F.first/
#: F.last, whose result in a groupBy depends on post-shuffle row
#: order — the same refresh could materialize different values
#: run-to-run (code-review r9)
_AGGS = {
    "avg": lambda c, ts: F.avg(c),
    "sum": lambda c, ts: F.sum(c),
    "min": lambda c, ts: F.min(c),
    "max": lambda c, ts: F.max(c),
    "first": lambda c, ts: F.min(F.when(c.isNotNull(), F.struct(ts.alias("t"), c.alias("v"))))["v"],
    "last": lambda c, ts: F.max(F.when(c.isNotNull(), F.struct(ts.alias("t"), c.alias("v"))))["v"],
    "count": lambda c, ts: F.count(c),
}


def rollup_sensor(
    engine: OngTsdbSpark,
    db: str,
    src_sensor: str,
    dst_sensor: str,
    freq: str,
    agg: str = "avg",
    start_ts: float | None = None,
    end_ts: float | None = None,
) -> None:
    """Materialize ``src_sensor`` aggregated to ``freq`` into
    ``dst_sensor`` (created on first call).  Incremental refresh:
    restrict with start/end — only touched destination partitions are
    overwritten (the upsert's dynamic-overwrite contract), so a
    periodic refresh job costs O(new data), not O(history).

    NaN cells are excluded from the aggregates (they mean "cell never
    written", reference scatter semantics), matching np.nanmean-style
    rollups.
    """
    if agg not in _AGGS:
        raise ValueError(f"unsupported agg {agg!r}; one of {sorted(_AGGS)}")
    cfg = engine.catalog.get_config(db, src_sensor)
    metrics = flatten_metrics(cfg.metrics)
    if not engine.exist_sensor(db, dst_sensor):
        engine.create_sensor(
            db,
            dst_sensor,
            freq=freq,
            metrics=list(metrics),
            metadata={**cfg.metadata, "rollup_of": src_sensor, "rollup_agg": agg},
        )
    grid = Grid.from_freq(freq)
    # bucket-align the refresh window: a span starting/ending
    # mid-bucket would recompute those buckets from PARTIAL source
    # data and overwrite the correct values — snap start down to its
    # bucket and extend end to the last instant of its bucket
    if start_ts is not None:
        start_ts = grid.snap(float(start_ts))
    end_excl = None
    if end_ts is not None:
        # The refresh window must stop strictly BEFORE the next bucket:
        # engine.read is end-inclusive and a float epsilon (1e-9) is
        # below one ULP at epoch magnitudes, so subtracting it would
        # still read the next bucket's first sample and recompute that
        # bucket from partial data (overwriting a correct value via
        # last-wins).  Read through the boundary, then drop rows at or
        # past it with an exact row filter — no float tricks.
        end_excl = grid.snap(float(end_ts)) + grid.tick_seconds
        end_ts = end_excl
    src = engine.read(db, src_sensor, start_ts=start_ts, end_ts=end_ts)
    if src is None:
        return
    if end_excl is not None:
        src = src.filter(F.col(TS_COL) < F.lit(float(end_excl)))
    bucket = grid.snap_expr(F.col(TS_COL)).cast("double").alias(TS_COL)
    fn = _AGGS[agg]
    aggs = []
    for m in metrics:
        c = F.col(f"`{m}`")
        clean = F.when(~F.isnan(c) & c.isNotNull(), c)  # NaN cell = absent
        aggs.append(fn(clean, F.col("__src_ts")).cast("double").alias(m))
    rolled = (
        src.select(
            bucket,
            F.col(TS_COL).alias("__src_ts"),
            *[F.col(f"`{m}`") for m in metrics],
        )
        .groupBy(TS_COL)
        .agg(*aggs)
    )
    engine.write_spark_df(db, dst_sensor, rolled)
