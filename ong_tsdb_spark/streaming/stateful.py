"""Custom stateful streaming operator: online per-series EWMA with
z-score anomaly flagging via ``applyInPandasWithState``.

This is the SURVEY §2.11 "custom stateful operator" slot: the
reference has no streaming engine at all, but a fixed-interval TSDB's
natural streaming companion is per-sensor online statistics.  State
per key is O(1) (ewma, ewmvar, count) regardless of stream length;
batches arrive as Arrow-backed pandas frames, so the per-key update is
a vectorized loop over one micro-batch, not a per-row crossing of the
Python boundary.

No watermark/timeout: like the engine's ingest, late rows are
processed when they arrive (the reference never drops late data).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("sensor", StringType()),
        StructField("ts_sec", DoubleType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("ewmvar", DoubleType()),
        StructField("count", LongType()),
    ]
)


def make_ewma_updater(
    alpha: float = 0.1, z_threshold: float = 3.0, warmup: int = 3
):
    """Build the (key, batches, state) -> frames updater; alpha and
    threshold are captured as plain Python floats (serialized with the
    function, no driver round trips).

    Robustness contract (code-review r9):

    * The group's micro-batch may arrive as SEVERAL Arrow chunks
      (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps each);
      they are concatenated and sorted ONCE, because per-chunk sorting
      would run the recursion out of global time order.
    * NULL/NaN values pass through (current ewma echoed, NaN z-score,
      no flag) WITHOUT touching state — one bad row must not poison a
      series' statistics forever (NaN propagates through every later
      update otherwise).
    * ``warmup``: no flag until ``warmup`` samples have been absorbed —
      after one sample the observed variance is exactly 0, so the
      second sample's z is +/-inf whenever it differs at all, a
      guaranteed false positive.  The z-score itself still reports the
      infinite surprise; only the flag waits."""
    import numpy as np

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ewma, ewmvar, count = state.get
        else:
            ewma, ewmvar, count = 0.0, 0.0, 0
        sensor = key[0]
        frames = list(batches)
        if not frames:  # defensive: no data, nothing to emit or update
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["ts_sec"], kind="stable")
        vals = pdf["value"].to_numpy(dtype="float64")
        out_ewma = []
        out_z = []
        out_flag = []
        for v in vals:
            if np.isnan(v):
                out_ewma.append(ewma)
                out_z.append(float("nan"))
                out_flag.append(0)
                continue
            if count == 0:
                ewma, ewmvar = v, 0.0
                z = 0.0
            else:
                delta = v - ewma
                std = ewmvar**0.5
                if std > 0:
                    z = delta / std
                elif delta == 0:
                    z = 0.0
                else:
                    # zero observed variance + any deviation:
                    # infinitely surprising
                    z = float("inf") if delta > 0 else float("-inf")
                ewma = ewma + alpha * delta
                ewmvar = (1 - alpha) * (ewmvar + alpha * delta * delta)
            flag = 1 if (count >= warmup and abs(z) > z_threshold) else 0
            count += 1
            out_ewma.append(ewma)
            out_z.append(z)
            out_flag.append(flag)
        yield pd.DataFrame(
            {
                "sensor": sensor,
                "ts_sec": pdf["ts_sec"].to_numpy(dtype="float64"),
                "value": vals,
                "ewma": out_ewma,
                "zscore": out_z,
                "is_anomaly": out_flag,
            }
        )
        state.update((float(ewma), float(ewmvar), int(count)))

    return update


def ewma_anomaly_stream(
    ticks: DataFrame,
    alpha: float = 0.1,
    z_threshold: float = 3.0,
    warmup: int = 3,
) -> DataFrame:
    """Attach the stateful EWMA operator to a streaming (sensor,
    ts_sec, value) frame.  Output mode must be 'append'/'update' at
    the sink; state never times out (late data welcome).  ``warmup``:
    samples absorbed before flags arm (see make_ewma_updater)."""
    return ticks.groupBy("sensor").applyInPandasWithState(
        make_ewma_updater(alpha, z_threshold, warmup),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
