"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`ong_tsdb_spark.entry_queries`, which holds the
(Spark query, DuckDB oracle SQL) registry — one entry per implemented
operator from SURVEY.md §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ong_tsdb_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_queries.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
