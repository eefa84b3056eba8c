"""Streaming windowed aggregation — tumbling/sliding windows with an
*optional* watermark.

SURVEY §2.11: the reference's only windows are the chunk (tumbling)
and grafana thinning buckets, and it never drops late data.  The
engine's streaming ingest therefore defaults to watermark-free
foreachBatch upserts (streaming/ingest.py).  This module is the
Spark-native completion of the window surface for pipelines that DO
want bounded state: watermarked tumbling/sliding aggregates in append
mode (state is purged once the watermark passes a window's end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    ticks: DataFrame,
    window_duration: str,
    slide_duration: str | None = None,
    watermark_delay: str | None = None,
    ts_col: str = "ts",
    series_cols: list[str] = ("sensor",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide_duration``) window aggregates
    per series: count / sum / min / max / avg of ``value_col``.

    With ``watermark_delay`` the query runs in append mode with
    bounded state — rows later than the delay are DROPPED, which is a
    deliberate departure from the engine's always-accept ingest; use
    it for derived dashboards, not the store of record.
    """
    df = ticks
    if watermark_delay is not None:
        df = df.withWatermark(ts_col, watermark_delay)
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    v = F.col(value_col)
    return (
        df.groupBy(*series_cols, win.alias("w"))
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
            F.avg(v).alias("avg_v"),
        )
        .select(
            *series_cols,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_v",
            "min_v",
            "max_v",
            "avg_v",
        )
    )
