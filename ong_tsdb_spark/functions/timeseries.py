"""Time-series column functions shared by operators and queries.

Cross-engine determinism convention (Spark vs the DuckDB oracle): all
query outputs expose time as **epoch microseconds (bigint)**, equal to
DuckDB's ``epoch_us(ts)`` for positive timestamps.  Exact integer
math, no doubles (ns since 1970 exceed 2^53).

DTYPE WARNING: the driver's testdata has shipped timestamp columns as
BOTH long-ns (TIMESTAMP(NANOS) under ``nanosAsLong``) and plain
timestamp[us].  ``ts_us``/``ts_sec`` below REQUIRE a long-ns column —
for columns whose dtype isn't known statically, use the
schema-adaptive ``entry_queries._us/_sec/_ns(df, col)`` instead
(pinned by tests/test_ts_dtypes.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

US_PER_SEC = 1_000_000


def ts_us(ts_ns_col: str) -> Column:
    """Column expr: long-ns column -> epoch microseconds (bigint).
    REQUIRES bigint ns input — see the module DTYPE WARNING."""
    return F.expr(f"`{ts_ns_col}` div 1000")


def ts_sec(ts_ns_col: str) -> Column:
    """Column expr: long-ns column -> whole epoch seconds (bigint).
    REQUIRES bigint ns input — see the module DTYPE WARNING."""
    return F.expr(f"`{ts_ns_col}` div 1000000000")


def snap_sec(ts_sec_col: Column, tick_seconds: int) -> Column:
    """Snap whole-second epoch down to a tick grid (reference
    Chunker.getpos truncation, chunker.py:88-95)."""
    t = int(tick_seconds)
    return (ts_sec_col - (ts_sec_col % F.lit(t))).cast("long")


def bucket_us(ts_us_col: Column, bucket_seconds: int) -> Column:
    """Tumbling-window bucket start in epoch seconds from a µs col."""
    b = int(bucket_seconds) * US_PER_SEC
    return ((ts_us_col - (ts_us_col % F.lit(b))) / F.lit(US_PER_SEC)).cast("long")


def nan_sum(cols: list[str]) -> Column:
    """Horizontal NaN-ignoring sum — the reference's row checksum
    (np.nansum over metric cells, database.py:484-485).  Built as a
    deterministic left-to-right fold over an array so Spark and the
    SQL oracle (``coalesce(a,0)+coalesce(b,0)+...``) agree bitwise.
    Stays inside whole-stage codegen (no UDF).
    """
    arr = F.array(*[F.col(c).cast("double") for c in cols])
    return F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc + F.when(x.isNotNull() & ~F.isnan(x), x).otherwise(F.lit(0.0)),
    )
