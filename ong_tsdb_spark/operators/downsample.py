"""W1 — downsampling by max-datapoints (bucketed thinning).

The reference's grafana ``/query`` computes ``tick_time_spread =
(end-start+1)/maxDataPoints`` and emits ~the first point per bucket
(server.py:412-475, esp. :430-434,:449-459).  Spark-first: a tumbling
bucket + ``row_number() == 1`` per (series, bucket), which Catalyst
executes as one shuffle by (series, bucket) — no driver iteration, no
chunk cursor.  At 100 TB the shuffle keys are (series, bucket) so
cardinality is bounded by the *output* size (maxDataPoints × series),
and the pre-aggregation filter prunes partitions by time range first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def thin_first_per_bucket(
    df: DataFrame,
    ts_col: str,
    bucket: Column,
    series_cols: list[str],
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the first row (by ts, then tiebreaks — deterministic) of
    each (series, bucket). Returns series + bucket_s + value cols."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*series_cols, "bucket_s").orderBy(*order)
    return (
        df.withColumn("bucket_s", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*series_cols, "bucket_s", *value_cols)
    )


def downsample_max_datapoints(
    df: DataFrame,
    ts_sec_col: str,
    start_sec: int,
    end_sec: int,
    max_datapoints: int,
    series_cols: list[str],
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Grafana-equivalent: spread = (end-start+1)/maxDataPoints, first
    point per spread bucket per series (server.py:430-434)."""
    if int(max_datapoints) <= 0:
        # grafana always sends a positive panel width; a zero from a
        # hand-rolled client would be a ZeroDivisionError here and a
        # negative one a nonsense bucket stride
        raise ValueError(f"max_datapoints must be >= 1, got {max_datapoints}")
    spread = max(int((end_sec - start_sec + 1) / max_datapoints), 1)
    ts = F.col(ts_sec_col)
    filtered = df.filter((ts >= start_sec) & (ts <= end_sec))
    bucket = (ts - ((ts - F.lit(start_sec)) % F.lit(spread))).cast("long")
    return thin_first_per_bucket(
        filtered, ts_sec_col, bucket, series_cols, value_cols, tiebreak_cols
    )
