"""Concurrency + volume parity with the reference's hardest tests:
4 concurrent writers with a schema extender and a post-hoc audit
(tests/test_database.py:141-207), and the 10,000-point multi-chunk
round trip (tests/test_client.py:148-153).
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
import pytest

from ong_tsdb_spark import OngTsdbSpark
from ong_tsdb_spark.plans import maintenance


@pytest.fixture()
def eng(spark, tmp_path):
    e = OngTsdbSpark(spark, str(tmp_path / "tsdb"))
    e.create_db("d")
    return e


def test_concurrent_writers_with_schema_extension(eng):
    eng.create_sensor("d", "s", "1s", ["m0"])
    base = 1672617600
    errors: list[Exception] = []

    def writer(thread_id: int) -> None:
        try:
            for batch in range(3):
                # each thread owns a disjoint ts range; thread 2 also
                # introduces a new metric mid-stream (the extender)
                metric = "m0" if thread_id != 2 or batch == 0 else f"m{thread_id}"
                pts = [
                    (metric, float(thread_id * 1000 + batch), float(base + thread_id * 100 + batch * 10 + i))
                    for i in range(5)
                ]
                eng.write_points("d", "s", pts)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # audit: every written cell holds the last value written to it and
    # the dataset has no duplicate or off-grid rows
    st = maintenance.verify_sensor(eng, "d", "s")
    assert st.duplicate_ts == 0 and st.off_grid == 0
    assert st.n_rows == 4 * 3 * 5
    out = eng.read_pandas("d", "s")
    assert "m2" in out.columns  # extender's metric arrived
    # thread 0 batch 2 wrote value 2.0 at base+20..base+24 in m0
    row = out.loc[pd.Timestamp(base + 20, unit="s", tz="UTC")]
    assert row["m0"] == 2.0


@pytest.mark.slow
def test_10k_point_round_trip(eng):
    # the reference's largest workload: 10k points, 10-min spacing,
    # 1 s sensor -> ~366 chunks (tests/test_client.py:148-153)
    eng.create_sensor("d", "big", "1s", ["active", "reactive"])
    idx = pd.date_range("2023-01-02", periods=10_000, freq="10min", tz="UTC")
    pdf = pd.DataFrame(
        {"active": np.arange(10_000.0), "reactive": np.arange(10_000.0) * 2},
        index=idx,
    )
    eng.write_df("d", "big", pdf)
    out = eng.read_pandas("d", "big")
    assert out.equals(pdf.astype("float32"))
    assert eng.get_last_timestamp("d", "big") == idx[-1].timestamp()
    # range read in the middle, still pruned + exact
    mid = eng.read_pandas(
        "d", "big", start_ts=idx[5000].timestamp(), end_ts=idx[5100].timestamp()
    )
    assert len(mid) == 101
    assert mid["active"].iloc[0] == 5000.0
