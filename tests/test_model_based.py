"""Model-based upsert testing: random write sequences are applied both
to the engine and to a trivial Python model of the reference's
semantics (a dict of grid-cell -> value with last-non-NaN-wins); reads
must agree exactly.  This is the strongest form of the reference's
round-trip oracle (SURVEY §5): rather than one scripted rotation, it
explores arbitrary interleavings of partial rows, duplicate cells,
off-grid timestamps, NaN inputs and schema growth.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ong_tsdb_spark import OngTsdbSpark

TICK = 60  # 1m sensor
BASE = 1_672_617_600  # 2023-01-02, grid-aligned

# a write op: (metric, value|None(=NaN), seconds-offset possibly off-grid)
op = st.tuples(
    st.sampled_from(["m1", "m2", "m3"]),
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    st.integers(min_value=0, max_value=600),
)
batches = st.lists(st.lists(op, min_size=1, max_size=6), min_size=1, max_size=4)


class Model:
    """The reference's storage semantics in ~20 lines: snap-to-grid,
    last-non-NaN-wins per cell, fill for rows predating a metric."""

    def __init__(self, initial_metrics: list[str], fill: float = 0.0):
        self.metrics = list(initial_metrics)
        self.fill = fill
        self.rows: dict[int, dict[str, float]] = {}  # ts -> {metric: value}
        self.row_born_metrics: dict[int, set[str]] = {}

    def write_batch(self, ops: list[tuple[str, int | None, int]]) -> None:
        new_metrics = {m for m, _, _ in ops if m not in self.metrics}
        for m in sorted(new_metrics):
            self.metrics.append(m)
        for m, v, off in ops:
            ts = BASE + (off // TICK) * TICK  # snap
            if ts not in self.rows:
                self.rows[ts] = {}
                self.row_born_metrics[ts] = set(self.metrics)
            if v is not None:  # NaN input never overwrites
                self.rows[ts][m] = float(v)

    def read(self) -> list[tuple[int, list[float]]]:
        out = []
        for ts in sorted(self.rows):
            vals = []
            for m in self.metrics:
                if m in self.rows[ts]:
                    vals.append(self.rows[ts][m])
                elif m not in self.row_born_metrics[ts]:
                    # metric added after this row was written -> fill
                    vals.append(self.fill)
                else:
                    vals.append(float("nan"))
            out.append((ts, vals))
        return out


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=batches)
def test_upsert_matches_model(spark, tmp_path_factory, batches):
    base = tmp_path_factory.mktemp("mb")
    eng = OngTsdbSpark(spark, str(base))
    eng.create_db("d")
    eng.create_sensor("d", "s", "1m", ["m1"])
    model = Model(["m1"])

    for ops in batches:
        pts = [
            (m, float("nan") if v is None else float(v), float(BASE + off))
            for m, v, off in ops
        ]
        eng.write_points("d", "s", pts)
        model.write_batch(ops)

    out = eng.read_pandas("d", "s")
    expected = model.read()
    assert len(out) == len(expected), "row count differs from model"
    assert list(out.columns) == model.metrics
    for (ts, vals), (idx, row) in zip(expected, out.iterrows()):
        assert idx.timestamp() == ts
        for m, v in zip(model.metrics, vals):
            got = row[m]
            if math.isnan(v):
                assert math.isnan(got), f"ts={ts} {m}: expected NaN got {got}"
            else:
                assert got == v, f"ts={ts} {m}: expected {v} got {got}"


# ----------------------------------------------------------------------
# chunk-parallel window exactness: chunked_window must be bit-identical
# to the same expressions over a plain per-key global window, for
# ARBITRARY series shapes — sparse chunks, duplicate order keys, nulls,
# single-row keys, chunk lengths down to 1 (every row its own chunk).
# ----------------------------------------------------------------------
_series_row = st.tuples(
    st.sampled_from(["a", "b"]),                       # key
    st.integers(min_value=0, max_value=60),            # order position
    st.one_of(st.none(), st.integers(-50, 50)),        # value (nullable)
)
_series = st.lists(_series_row, min_size=1, max_size=28)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_series, chunk_len=st.sampled_from([1, 2, 5, 9]))
def test_chunked_window_equals_global_window(spark, rows, chunk_len):
    from functools import reduce
    from operator import add

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ong_tsdb_spark.operators.chunkwin import chunked_window

    data = [
        (k, t, None if v is None else float(v), i)
        for i, (k, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k string, t long, v double, rid long")

    def _build(w):
        wf = w.rowsBetween(-3, 0)
        terms = [
            F.coalesce(F.lag("v", j).over(w), F.lit(0.0)) * F.lit(float(j + 1))
            for j in range(1, 4)
        ]
        return {
            "lag1": F.lag("v", 1).over(w),
            "lag3": F.lag("v", 3).over(w),
            "roll": F.sum(F.col("v").cast("decimal(18,2)")).over(wf).cast("double"),
            "wsum": reduce(add, terms),
        }

    chunked = chunked_window(
        df,
        key_cols=["k"],
        order_cols=["t", "rid"],
        chunk_len=chunk_len,
        build=_build,
        rows_before=3,
    )
    got = sorted((tuple(r) for r in chunked.collect()), key=repr)

    wg = Window.partitionBy("k").orderBy("t", "rid")
    cols = _build(wg)
    glob = df.select("*", *[c.alias(n) for n, c in cols.items()])
    want = sorted((tuple(r) for r in glob.collect()), key=repr)
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_series, chunk_len=st.sampled_from([1, 3, 8]))
def test_chunked_running_sum_equals_global_window(spark, rows, chunk_len):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ong_tsdb_spark.operators.prefix import chunked_running_sum

    data = [
        (k, t, 0 if v is None else int(v), i)
        for i, (k, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k string, t long, v long, rid long")
    out = chunked_running_sum(
        df,
        key_cols=["k"],
        order_cols=["t", "rid"],
        value=F.col("v"),
        chunk=F.floor(F.col("t") / F.lit(chunk_len)),
        out_col="run",
    )
    got = sorted((r["k"], r["t"], r["rid"], r["run"]) for r in out.collect())
    wg = (
        Window.partitionBy("k")
        .orderBy("t", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        (r["k"], r["t"], r["rid"], r["run"])
        for r in df.withColumn("run", F.sum("v").over(wg)).collect()
    )
    assert got == want


# ----------------------------------------------------------------------
# gap-fill exactness vs a trivial Python model: random sparse series
# (duplicate cells, nulls, far-apart chunks, single-point keys) must
# materialize exactly the grid ticks between each key's min/max snapped
# observation, forward-filled last-observation-wins per cell.
# ----------------------------------------------------------------------
_gf_row = st.tuples(
    st.sampled_from(["x", "y"]),                      # series key
    st.integers(min_value=0, max_value=400),          # raw ts seconds
    st.one_of(st.none(), st.integers(-20, 20)),       # value (None = null)
)
_gf_series = st.lists(_gf_row, min_size=1, max_size=20)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_gf_series, chunk_ticks=st.sampled_from([2, 4, 16]))
def test_gap_fill_ffill_matches_model(spark, rows, chunk_ticks):
    from ong_tsdb_spark.operators.gapfill import gap_fill_ffill

    TICK_S = 30
    data = [
        (k, t, None if v is None else float(v), i)
        for i, (k, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k string, ts long, v double, rid long")
    out = gap_fill_ffill(
        df,
        ts_sec_col="ts",
        series_cols=["k"],
        value_cols=["v"],
        tick_seconds=TICK_S,
        tiebreak_cols=["rid"],
        chunk_ticks=chunk_ticks,
    )
    got = sorted(((r["k"], r["tick_s"], r["v"]) for r in out.collect()), key=repr)

    # python model: snap, last-raw-ts (tiebreak rid) wins per cell,
    # grid min..max snapped tick, ffill last non-null at-or-before
    cells: dict = {}
    for k, t, v, rid in data:
        tick = t - t % TICK_S
        prev = cells.get((k, tick))
        if prev is None or (t, rid) > prev[0]:
            cells[(k, tick)] = ((t, rid), v)
    want = []
    for k in {k for k, *_ in data}:
        ticks = [tick for (kk, tick) in cells if kk == k]
        last = None
        for tick in range(min(ticks), max(ticks) + TICK_S, TICK_S):
            if (k, tick) in cells and cells[(k, tick)][1] is not None:
                last = cells[(k, tick)][1]
            want.append((k, tick, last))
    want = sorted(want, key=repr)
    got = sorted(got, key=repr)
    assert got == want


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    n=st.integers(min_value=0, max_value=120),
    salt=st.sampled_from(["a", "epoch-1", "xyz"]),
    n_buckets=st.sampled_from([2, 8, 64, 1024]),
    bins=st.sampled_from([1, 7, 64]),
)
def test_shuffled_shard_layout_matches_global_rank_model(
    spark, n, salt, n_buckets, bins
):
    """Property twin of the fixed-size layout test: for ANY table
    size (including empty), salt, power-of-two bucket count, and shard
    width, the bucketed two-level shuffle_rank equals the rank of a
    driver-side global sort by (md5(salt|id), id), and shard_id obeys
    (rank-1) div bins — the exactness claim the byte-level shard
    writer rides on, at randomized shapes instead of one."""
    import hashlib

    from ong_tsdb_spark.plans.tokenized_shards import shuffled_shard_layout

    seqs = spark.range(n).selectExpr("id AS seq_id")
    got = {
        r["seq_id"]: (r["shuffle_rank"], r["shard_id"])
        for r in shuffled_shard_layout(
            seqs, bins_per_shard=bins, n_buckets=n_buckets, salt=salt
        ).collect()
    }
    order = sorted(
        range(n),
        key=lambda i: (hashlib.md5(f"{salt}|{i}".encode()).hexdigest(), i),
    )
    want = {
        sid: (rank + 1, rank // bins) for rank, sid in enumerate(order)
    }
    assert got == want
