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

    Scale shape (reworked per VERDICT r6 #7 — this family's 100x row
    was the second-worst join curve at 15.8x): ONE pass over events
    into a user-keyed ``collect_set(period)`` (map-side partial merge
    dedups before the wire, so the shuffle carries the distinct
    (user, active-period) mass exactly once), then cohort =
    ``array_min`` and an explode straight into the (cohort, period)
    count.  The previous shape moved the same distinct mass THREE
    times (distinct exchange, per-user min aggregate, join back) and
    scanned the projection twice; this one has no join at all and its
    second shuffle is (cohort x period)-bounded — O(active weeks^2)
    rows regardless of corpus size.  Per-user state is bounded by the
    timeline's period count (~hundreds for weekly periods), never by
    event count."""
    per = F.floor(F.col(us_col) / F.lit(int(period_us))).cast("long")
    # Null timestamps are dropped EXPLICITLY (a null period cannot
    # cohort or count a user): collect_set would skip them silently
    # anyway, but the filter makes the contract visible and keeps it
    # independent of that aggregate's null behavior — an all-null
    # user contributes no rows.  Null USERS are dropped too (code-
    # review r9, edge corpus): an anonymous event has no retention
    # identity — and the join-free groupBy would otherwise count the
    # NULL key as one phantom "user", where every SQL formulation's
    # user-keyed join drops it (NULL never joins NULL).
    per_user = (
        df.select(F.col(user_col), per.alias("period"))
        .filter(F.col("period").isNotNull() & F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(F.collect_set("period").alias("ps"))
    )
    return (
        per_user.select(
            F.array_min("ps").alias("cohort"),
            F.explode("ps").alias("period"),
        )
        .groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .withColumn(
            "periods_since", (F.col("period") - F.col("cohort")).cast("bigint")
        )
        .select("cohort", "period", "periods_since", "n_users")
    )
