"""Grid arithmetic parity with the reference's Chunker formulas
(reference src/ong_tsdb/chunker.py:32-114). Pure-Python tests, no Spark.
"""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from ong_tsdb_spark.grid import CHUNK_ROWS, Grid, InvalidFrequencyError, parse_freq


@pytest.mark.parametrize(
    "freq,expected",
    [
        ("1s", 1.0),
        ("3s", 3.0),
        ("15m", 900.0),
        ("1h", 3600.0),
        ("1d", 86400.0),
        ("7d", 7 * 86400.0),
        ("1D", 86400.0),
        ("s", 1.0),
        ("H", 3600.0),
        ("T", 60.0),
        ("S", 1.0),
        ("5T", 300.0),
        ("100L", 0.1),
        ("1U", 1e-6),
        ("1N", 1e-9),
        ("0.5s", 0.5),
    ],
)
def test_parse_freq(freq, expected):
    assert parse_freq(freq) == pytest.approx(expected)


@pytest.mark.parametrize("bad", ["", "x", "1x", "-1s", "0s", "1.2.3s", "s1"])
def test_parse_freq_invalid(bad):
    with pytest.raises(InvalidFrequencyError):
        parse_freq(bad)


def _ref_chunk_timestamp(ts: float, tick: float) -> float:
    """Reference formula, chunker.py:74-76."""
    d = CHUNK_ROWS * tick
    return int(ts / d) * d


def _ref_getpos(ts: float, tick: float) -> int:
    """Reference formula, chunker.py:88-95."""
    return int((ts - _ref_chunk_timestamp(ts, tick)) / tick)


@given(
    ts=st.floats(min_value=0, max_value=4e9, allow_nan=False),
    tick=st.sampled_from([1.0, 3.0, 60.0, 900.0, 3600.0, 86400.0]),
)
def test_grid_matches_reference_formulas(ts, tick):
    g = Grid(tick)
    assert g.chunk_start(ts) == _ref_chunk_timestamp(ts, tick)
    assert g.pos(ts) == _ref_getpos(ts, tick)
    snapped = g.snap(ts)
    assert snapped <= ts
    assert ts - snapped < tick
    # snapping is idempotent
    assert g.snap(snapped) == snapped


def test_chunk_duration():
    assert Grid(1.0).chunk_duration == 16384
    assert Grid.from_freq("1h").chunk_duration == 16384 * 3600


def test_grid_exprs_match_scalar(spark):
    import pyspark.sql.functions as F

    g = Grid(900.0)
    # includes pre-1970 (negative) values: driver scalars must agree
    # with the Catalyst floor exprs there too (toward -inf, not zero)
    ts_vals = [
        0.0, 1.5, 899.9, 900.0, 16384 * 900.0 - 1, 16384 * 900.0, 1.7e9 + 123.4,
        -1.0, -899.9, -900.0, -16384 * 900.0 - 1, -1.7e9 + 123.4,
    ]
    df = spark.createDataFrame([(t,) for t in ts_vals], "ts_sec double").select(
        "ts_sec",
        g.chunk_start_expr(F.col("ts_sec")).alias("cs"),
        g.snap_expr(F.col("ts_sec")).alias("snap"),
        g.pos_expr(F.col("ts_sec")).alias("pos"),
    )
    for row in df.collect():
        assert row["cs"] == g.chunk_start(row["ts_sec"])
        assert row["snap"] == g.snap(row["ts_sec"])
        assert row["pos"] == g.pos(row["ts_sec"])


def test_parse_freq_rejects_pandas_calendar_aliases():
    """Code-review r9: 'MS' (pandas month-start) silently hit the
    lowercase fallback and parsed as MILLISECONDS (1 ms tick, one
    partition dir per ~16 s of data); 'M' (month-end) as minutes.
    Calendar frequencies have no fixed tick — both must raise."""
    import pytest as _pytest

    from ong_tsdb_spark.grid import InvalidFrequencyError, parse_freq

    for bad in ("MS", "M", "1MS", "2M"):
        with _pytest.raises(InvalidFrequencyError):
            parse_freq(bad)
    # the fixed-width spellings stay valid, any case
    assert parse_freq("ms") == 1e-3
    assert parse_freq("Min") == 60.0
    assert parse_freq("T") == 60.0
