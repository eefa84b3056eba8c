"""Sequential-pattern analytics over event streams (the events-table
counterpart of the funnel query in entry_queries): cohort retention
triangles — the standard product-analytics rollup a 100 TB event
corpus feeds.

Pure integer arithmetic (epoch-us floor-divided into periods), and
every shuffle is user- or (cohort, period)-bounded, never event-count
bounded: the per-user first-activity aggregate and the (user, period)
distinct both partial-combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(
    df: DataFrame,
    us_col: str = "us",
    user_col: str = "user_id",
    period_us: int = WEEK_US,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period of
    their FIRST activity; for every (cohort, period) the count of
    cohort members active in that period.  ``periods_since`` is the
    familiar retention-curve x-axis (0 = the cohort's own period).

    Input: one row per event with an epoch-microsecond column (use the
    engine's dtype-adaptive ``epoch_us`` helpers to produce it).
    Output: (cohort, period, periods_since, n_users), n_users > 0 rows
    only.

    Scale shape: project to (user, period) -> distinct (map-side
    partial) -> min-agg per user for the cohort -> broadcast-sized
    join back -> (cohort, period) count.  The shuffles carry
    user x active-period rows at most — at 100 TB with events bucketed
    by user the first two stages are co-partitioned."""
    per = F.floor(F.col(us_col) / F.lit(int(period_us))).cast("long")
    w = df.select(F.col(user_col), per.alias("period")).distinct()
    first = w.groupBy(user_col).agg(F.min("period").alias("cohort"))
    return (
        w.join(first, on=user_col)
        .groupBy("cohort", "period")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .withColumn(
            "periods_since", (F.col("period") - F.col("cohort")).cast("bigint")
        )
        .select("cohort", "period", "periods_since", "n_users")
    )
