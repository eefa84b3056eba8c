"""Pin: the registry is timestamp-dtype-adaptive.

Round 3 post-mortem — the driver regenerated testdata and events.ts
flipped from TIMESTAMP(NANOS) (long ns under ``nanosAsLong``) to plain
``timestamp[us]`` (TIMESTAMP_NTZ), and every ``ts_*`` query died at
analysis because the µs-conversion helpers hard-assumed bigint-ns.

This test re-encodes a small events slice BOTH ways and asserts each
ts-family registry query produces identical output on the two
encodings, so the next testdata regeneration cannot zero the board.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ong_tsdb_spark import entry_queries

# events-only queries spanning every helper: _us, _sec, _ns (influx),
# _ts_pred_* (range), plus every reroute family — chunkwin (delta/
# rate/twa), prefix (cumulative), gapfill, downsample, window OHLC
QUERIES = [
    "ts_range_read",
    "ts_snap_grid",
    "ts_last_timestamp",
    "ts_usage_stats",
    "ts_ingest_grouping",
    "influx_roundtrip",
    "ts_sessionize",
    "ts_rate",
    "ts_cumulative_sum_chunked",
    "ts_ohlc",
    "ts_time_weighted_avg",
    "ts_downsample_first",
    "ts_asof_join",
    "ts_upsert_last_wins",
    "ts_gap_fill_linear",
    "ts_moving_range_avg",
    "ts_pivot_daily",
    "ts_ewma",
    "ts_mad_anomaly",
]


@pytest.fixture(scope="module")
def dual_dirs(sf_dir, tmp_path_factory):
    """Two copies of the sf0.001 events table: timestamp[us] and
    TIMESTAMP(NANOS)."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts = src.column("ts")
    # normalize to µs first, then derive both encodings from it
    us_type = pa.timestamp("us")
    ns_type = pa.timestamp("ns")
    as_us = src.set_column(src.schema.get_field_index("ts"), "ts", ts.cast(us_type))
    as_ns = as_us.set_column(
        as_us.schema.get_field_index("ts"), "ts", as_us.column("ts").cast(ns_type)
    )
    d_us = tmp_path_factory.mktemp("events_us")
    d_ns = tmp_path_factory.mktemp("events_ns")
    pq.write_table(as_us, d_us / "events.parquet")
    # parquet 2.6 logical types keep TIMESTAMP(NANOS) as nanos
    pq.write_table(as_ns, d_ns / "events.parquet", version="2.6", coerce_timestamps=None)
    # sanity: the two files really carry different physical types
    assert pq.read_schema(d_us / "events.parquet").field("ts").type == us_type
    assert pq.read_schema(d_ns / "events.parquet").field("ts").type == ns_type
    return str(d_us), str(d_ns)


@pytest.mark.parametrize("name", QUERIES)
def test_same_output_both_encodings(spark, dual_dirs, name):
    d_us, d_ns = dual_dirs
    fn = entry_queries.queries()[name]
    a = fn(spark, d_us).toPandas()
    b = fn(spark, d_ns).toPandas()
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_ns_encoding_reads_as_bigint(spark, dual_dirs):
    """The ns copy must exercise the bigint branch (not silently read
    as timestamp), otherwise this suite pins nothing."""
    _, d_ns = dual_dirs
    ev = entry_queries.load(spark, d_ns, "events")
    assert ev.schema["ts"].dataType.simpleString() == "bigint"


def test_us_encoding_reads_as_timestamp(spark, dual_dirs):
    d_us, _ = dual_dirs
    ev = entry_queries.load(spark, d_us, "events")
    assert ev.schema["ts"].dataType.simpleString().startswith("timestamp")
