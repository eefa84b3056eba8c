"""Physical-layout helpers for 100 TB operation: bucketed tables for
co-located (shuffle-free) joins, and salted joins for skewed keys.

These are the two levers the DataFrame API doesn't apply automatically:

* **Bucketing** (`bucketize`): persist both join sides bucketed by the
  join key into the session catalog — repeated joins on that key then
  sort-merge WITHOUT an Exchange on either side.  Worth it when a fact
  table is joined on the same key by many queries (the reference's
  analog: chunk files pre-grouped by sensor, fileutils.py:294-308).
* **Salting** (`salted_join`): explode one hot key into N synthetic
  sub-keys to spread a skewed build side over N tasks.  AQE's skew
  handling covers sort-merge joins; salting still wins for skewed
  broadcast-side aggregation or when AQE is off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table; returns the re-read table.  Joins between two tables
    bucketed by the same key/count skip the shuffle entirely."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (small-ish) right side is
    replicated ``num_salts`` times with synthetic sub-keys; the left
    side picks a random-but-deterministic salt per row (hash of its
    other columns), so one hot key spreads over ``num_salts`` tasks.

    Output columns = left's + right's non-key columns (like a plain
    join on ``key``)."""
    salt_values = F.array(*[F.lit(i) for i in range(num_salts)])
    l_salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)).cast(
            "int"
        ),
    )
    r_salted = right.withColumn("__salt", F.explode(salt_values))
    out = l_salted.join(r_salted, on=[key, "__salt"], how=how)
    return out.drop("__salt")
