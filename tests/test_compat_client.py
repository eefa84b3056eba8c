"""The reference's own end-to-end client scenario, run against the
compat client (tests/test_client.py of the reference): create db +
sensors, the 6-line influx rotation with a new metric mid-stream,
write_df round trip, multiindex + level_names mutation, exist/delete.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ong_tsdb_spark.compat import OngTsdbClient


@pytest.fixture()
def client(spark, tmp_path):
    return OngTsdbClient(str(tmp_path / "db"), token=None, spark=spark)


def test_lifecycle_bools(client):
    assert client.create_db("testing_database") is True
    assert client.create_db("testing_database") is False  # already exists
    assert client.exist_db("testing_database")
    assert client.create_sensor("testing_database", "s1", "1s", ["active", "reactive"])
    assert not client.create_sensor("testing_database", "s1", "1s", ["active"])
    assert client.exist_sensor("testing_database", "s1")
    assert client.delete_sensor("testing_database", "s1") is True
    assert client.delete_sensor("testing_database", "s1") is False


def test_influx_rotation_with_new_metric(client):
    """The reference's write_ts rotation (tests/test_client.py:65-78):
    both metrics, reversed order, partial rows, and a new metric."""
    client.create_db("db")
    client.create_sensor("db", "s", "1s", ["active", "reactive"])
    t0 = 1672617600
    batch1 = [
        f"db,key=s active=9,reactive=10 {(t0 + 0) * 10**9}",
        f"db,key=s active=11 {(t0 + 1) * 10**9}",
        f"db,key=s reactive=12 {(t0 + 2) * 10**9}",
        f"db,key=s reactive=13,active=14 {(t0 + 3) * 10**9}",
    ]
    # nueva arrives in a LATER batch: reference add_new_metrics fills
    # pre-existing rows only (rows written in the same batch as the
    # new metric would get NaN, like any unmentioned cell)
    batch2 = [
        f"db,key=s nueva=15 {(t0 + 4) * 10**9}",
        f"db,key=s active=16,reactive=17,nueva=18 {(t0 + 5) * 10**9}",
    ]
    assert client.write(batch1) is True
    assert client.write(batch2) is True
    assert client.get_metrics("db", "s") == ["active", "reactive", "nueva"]
    df = client.read("db", "s", pd.Timestamp(t0, unit="s"))
    assert len(df) == 6
    assert df["active"].tolist()[:2] == [9.0, 11.0]
    assert np.isnan(df["reactive"].iloc[1])  # partial row
    assert df["reactive"].iloc[3] == 13.0 and df["active"].iloc[3] == 14.0
    assert df["nueva"].tolist()[:4] == [0.0, 0.0, 0.0, 0.0]  # batch-1 rows filled
    assert df["nueva"].iloc[4] == 15.0
    assert np.isnan(df["active"].iloc[4])  # batch-2 partial row: NaN cell
    assert client.get_lasttimestamp("db", "s") == t0 + 5


def test_write_tuples(client):
    client.create_db("db")
    client.create_sensor("db", "s", "1s", ["m1", "m2"])
    t0_ns = 1672617600 * 10**9
    seq = [("db", "s", ["m1", "m2"], [1.5, 2.5], t0_ns)]
    assert client.write(seq) is True
    df = client.read("db", "s", pd.Timestamp("2023-01-01"))
    assert df["m1"].iloc[0] == 1.5 and df["m2"].iloc[0] == 2.5


def test_write_df_roundtrip_and_tz(client):
    client.create_db("db")
    client.create_sensor("db", "s", "15m", ["una", "dos", "tres"])
    idx = pd.date_range("2023-03-01", periods=10, freq="15min", tz="UTC")
    pdf = pd.DataFrame(
        np.ones((10, 3)), index=idx, columns=["una", "dos", "tres"]
    )
    assert client.write_df("db", "s", pdf) is True
    # naive date_from -> naive index
    out = client.read("db", "s", pd.Timestamp("2023-03-01"))
    assert out.index.tz is None
    # aware date_from -> same tz back
    out2 = client.read("db", "s", pd.Timestamp("2023-03-01", tz="Europe/Madrid"))
    assert str(out2.index.tz) == "Europe/Madrid"
    assert out2["una"].sum() == 10.0


def test_local_read_equals_read(client):
    """The reference's read == local_read assertion
    (tests/test_client.py:93-112) on a round-trip fixture, including
    the reference's metrics-subset semantics (local_read subsets
    columns post-read, client.py:487-490)."""
    client.create_db("db")
    client.create_sensor("db", "s", "1s", ["active", "reactive"])
    idx = pd.date_range("2023-05-01", periods=50, freq="1s", tz="UTC")
    pdf = pd.DataFrame(
        {"active": np.arange(50.0), "reactive": np.arange(50.0) * 2}, index=idx
    )
    assert client.write_df("db", "s", pdf) is True

    for date_from in (pd.Timestamp("2023-05-01"), idx[0]):  # naive and aware
        df = client.read("db", "s", date_from)
        df_local = client.local_read("db", "s", date_from)
        assert len(df_local.index) == len(df.index)
        assert df.equals(df_local)
    # metrics subset: same rows, only the requested column
    sub = client.local_read("db", "s", idx[0], metrics=["reactive"])
    assert list(sub.columns) == ["reactive"]
    assert sub["reactive"].equals(client.read("db", "s", idx[0])["reactive"])
    # bounded date_to agrees too
    half = client.local_read("db", "s", idx[0], date_to=idx[24])
    assert df.loc[: idx[24]].equals(half) and len(half) == 25


def test_multiindex_level_names(client):
    metrics = [["A", "B", "C"], ["D", "E", "F"]]
    client.create_db("db")
    assert client.create_sensor(
        "db", "meta", "1D", metrics, level_names=["one", "two", "three"]
    )
    cols = pd.MultiIndex.from_tuples(
        [("A", "B", "C"), ("D", "E", "F")], names=["one", "two", "three"]
    )
    pdf = pd.DataFrame([[1.0, 2.0]], index=pd.DatetimeIndex(["2023-01-02"]), columns=cols)
    client.write_df("db", "meta", pdf)
    out = client.read("db", "meta", pd.Timestamp("2023-01-01"))
    assert out.columns.names == ["one", "two", "three"]
    client.set_level_names("db", "meta", ["X", "Y", "Z"])
    out2 = client.read("db", "meta", pd.Timestamp("2023-01-01"))
    assert out2.columns.names == ["X", "Y", "Z"]


def test_read_grafana_downsampled(client):
    client.create_db("db")
    client.create_sensor("db", "s", "1s", ["v"])
    idx = pd.date_range("2023-01-02", periods=200, freq="1s", tz="UTC")
    client.write_df("db", "s", pd.DataFrame({"v": np.arange(200.0)}, index=idx))
    out = client.read_grafana(
        "db", "s", idx[0].tz_localize(None), idx[-1].tz_localize(None), max_datapoints=20
    )
    assert len(out) == 20
    assert out.index.tz is None


def test_read_default_end_hides_future(client):
    import time

    client.create_db("db")
    client.create_sensor("db", "s", "1s", ["v"])
    now = time.time()
    future = now + 7 * 86400
    client.write([f"db,key=s v=1.0 {int((now - 60) * 1e9)}",
                  f"db,key=s v=2.0 {int(future * 1e9)}"])
    # no date_to -> reference semantics: end = now, future row invisible
    out = client.read("db", "s", pd.Timestamp(now - 3600, unit="s", tz="UTC"))
    assert out["v"].tolist() == [1.0]
    # explicit future end makes it visible
    out2 = client.read(
        "db", "s",
        pd.Timestamp(now - 3600, unit="s", tz="UTC"),
        pd.Timestamp(future + 60, unit="s", tz="UTC"),
    )
    assert out2["v"].tolist() == [1.0, 2.0]


def test_version_handshake_key_semantics():
    """F11: zero-padded release keys — '0.2' == '0.2.0'; pre-release
    components keep their leading digits ('0.3.0rc1' release = 0.3.0);
    older server raises, newer passes (round-2 ADVICE low fix)."""
    from ong_tsdb_spark.check_versions import (
        WrongServerVersion,
        check_version,
        check_version_and_raise,
        _release_key,
    )

    assert _release_key("0.2") == _release_key("0.2.0")
    assert _release_key("0.3.0rc1")[:3] == (0, 3, 0)
    assert _release_key("1.2.3+cpu") == _release_key("1.2.3")
    assert check_version("0.2.0", client_version="0.2")
    assert check_version("0.2", client_version="0.2.0")
    assert check_version("0.3.0rc1", client_version="0.3.0")
    assert check_version("9.9.9", client_version="0.1.0")
    assert not check_version("0.0.1", client_version="0.1.0")
    with pytest.raises(WrongServerVersion):
        check_version_and_raise("0.0.0")
    check_version_and_raise("999.0")  # newer server: fine


def test_connect_taxonomy_and_kwargs(spark, tmp_path):
    """Reference constructor-surface parity (client.py:40-147): the
    retry/proxy kwargs are accepted, auto_connect gates the probe, and
    the connection-refused taxonomy maps to filesystem reality."""
    from ong_tsdb_spark.compat import (
        OngTsdbClientBaseError, ServerDownError, WrongAddressError,
    )

    # full reference kwarg surface accepted; localhost-style default
    # retry_connect mirrors the reference's 1
    c = OngTsdbClient(
        str(tmp_path / "ok"), token=None, spark=spark,
        retry_total=5, retry_backoff_factor=0.3, proxy_auth_body={"user": "x"},
        validate_server_version=True, auto_connect=True,
    )
    assert c.retry_connect == 1 and c.retry_total == 5
    c.connect()  # repeatable, like the reference
    c.connect()

    # path exists but is a file -> WrongAddressError (bad address)
    f = tmp_path / "a_file"
    f.write_text("x")
    with pytest.raises(WrongAddressError):
        OngTsdbClient(str(f), token=None, spark=spark)
    assert issubclass(WrongAddressError, OngTsdbClientBaseError)
    assert issubclass(ServerDownError, OngTsdbClientBaseError)

    # deferred connection: constructing against the bad address is
    # fine with auto_connect=False; connect() raises on first use
    c2 = OngTsdbClient(str(f), token=None, spark=spark, auto_connect=False)
    with pytest.raises(WrongAddressError):
        c2.connect()
