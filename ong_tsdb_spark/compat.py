"""Drop-in client façade with the reference client's public API
(``OngTsdbClient``, reference src/ong_tsdb/client.py) so code written
against the reference ports verbatim — same method names, signatures,
return conventions (bools for DDL, None-on-missing for metadata,
pandas frames whose index tz follows ``date_from``).

Backed directly by the Spark engine (the reference's ``local_read``
mode, client.py:27-36,468-491); the HTTP hop is replaced by the
SparkSession.  ``url`` is accepted for signature parity; it selects
the engine base dir.
"""

from __future__ import annotations

from typing import Any, Sequence

import pandas as pd
from pyspark.sql import SparkSession

from .auth import NotAuthorizedError
from .catalog import ElementAlreadyExistsError, ElementNotFoundError
from .engine import OngTsdbSpark
from .sources.influx import PARSED_COLS  # noqa: F401 (re-export convenience)


class OngTsdbClientBaseError(Exception):
    """Root of the client-side error taxonomy (reference
    exceptions.py:1-44)."""


class ServerDownError(OngTsdbClientBaseError):
    """The storage location is unreachable — the in-process analogue
    of the reference's connection-refused ServerDownException."""


class WrongAddressError(OngTsdbClientBaseError):
    """The configured location can never serve as a database (e.g. the
    path exists but is a file) — the reference's bad-URL taxonomy."""


class OngTsdbClient:
    """Reference-API client over the Spark engine.

    Accepts the reference constructor's full keyword surface
    (client.py:40-90) so call sites port verbatim: the retry knobs and
    ``proxy_auth_body`` are stored but inert HERE (this client is
    in-process — no HTTP hop to retry or proxy to negotiate; the
    reference's proxy/MFA negotiation protocol itself lives at the
    HTTP tier in ``service/proxy.negotiate_proxy_auth`` against the
    ``MfaAuthProxy`` middleware), ``validate_server_version`` gates
    the version handshake, and ``auto_connect`` gates the
    reachability probe exactly like the reference's
    deferred-connection mode."""

    def __init__(
        self,
        url: str,
        token: str | None = None,
        spark: SparkSession | None = None,
        admin_key: str | None = None,
        retry_total: int | None = None,
        retry_connect: int | None = None,
        retry_backoff_factor: float = 0.2,
        proxy_auth_body: dict | None = None,
        validate_server_version: bool = True,
        auto_connect: bool = True,
    ):
        self._base_dir = url.replace("file://", "")
        self.token = token
        # reference client.py:74-77: localhost defaults to 1 connect
        # retry, remote to 10 — mirrored for introspection parity even
        # though no request ever leaves the process
        self.retry_total = retry_total
        self.retry_connect = retry_connect if retry_connect is not None else 1
        self.retry_backoff_factor = retry_backoff_factor
        self.proxy_auth_body = dict(proxy_auth_body or {})
        self.validate_server_version = validate_server_version
        self._spark = spark or SparkSession.builder.getOrCreate()
        self._admin_key = admin_key
        self.__engine: OngTsdbSpark | None = None
        # wire-parity version handshake (reference client.py:230-233):
        # in-process the "server" is this same package, so this can
        # only fail on a genuinely mixed install — but the check (and
        # its exception type) is part of the public surface.
        from . import __version__

        self.server_version = __version__
        if validate_server_version:
            from .check_versions import check_version_and_raise

            check_version_and_raise(self.server_version)
        if auto_connect:
            self.connect()

    @property
    def _engine(self) -> OngTsdbSpark:
        """Engine construction is deferred to first use (the
        reference's ``auto_connect=False`` contract: a bad address
        must not fail at construction time, only at first request) and
        translates filesystem failures into the client taxonomy."""
        if self.__engine is None:
            import os

            base = self._base_dir
            if os.path.exists(base) and not os.path.isdir(base):
                raise WrongAddressError(f"not a directory: {base}")
            try:
                self.__engine = OngTsdbSpark(
                    self._spark, base, admin_key=self._admin_key
                )
            except OSError as e:
                raise ServerDownError(f"storage unreachable: {base}: {e}") from e
        return self.__engine

    def connect(self) -> None:
        """Reachability probe (reference client.py:92-147: connect()
        performs a config reload as the connection test).  In-process
        the "server address" is the storage location, so the
        connection-refused taxonomy maps to filesystem reality:
        a path that exists but is not a directory can NEVER become a
        database -> :class:`WrongAddressError`; a location that cannot
        be listed, or whose PARENT does not exist (mistyped path,
        absent mount) -> :class:`ServerDownError`.  The probe inspects
        the path WITHOUT constructing the engine — constructing it
        would mkdir the storage root and make every bad address look
        healthy by fabricating an empty directory.  A nonexistent base
        whose parent exists is fine (local create-on-first-use
        semantics).  Safe to call repeatedly, like the reference's."""
        import os

        base = self._base_dir
        if os.path.exists(base):
            if not os.path.isdir(base):
                raise WrongAddressError(f"not a directory: {base}")
            try:
                os.listdir(base)
            except OSError as e:
                raise ServerDownError(f"storage unreachable: {base}: {e}") from e
        else:
            parent = os.path.dirname(os.path.abspath(base)) or "/"
            if not os.path.isdir(parent):
                raise ServerDownError(
                    f"storage unreachable (missing mount or mistyped path): {base}"
                )

    # -- db lifecycle ---------------------------------------------------
    def exist_db(self, database: str) -> bool:
        return self._engine.exist_db(database)

    def create_db(self, database: str) -> bool:
        try:
            self._engine.create_db(database, key=self.token)
            return True
        except ElementAlreadyExistsError:
            return False

    def delete_db(self, database: str) -> bool:
        try:
            self._engine.delete_db(database, key=self.token)
            return True
        except ElementNotFoundError:
            return False

    # -- sensor lifecycle ----------------------------------------------
    def exist_sensor(self, database: str, sensor: str) -> bool:
        return self._engine.exist_sensor(database, sensor)

    def create_sensor(
        self,
        database: str,
        sensor: str,
        period: str,
        metrics: list,
        read_key: str = "",
        write_key: str = "",
        metadata: dict[str, Any] | None = None,
        level_names: list[str] | None = None,
    ) -> bool:
        if metadata is not None and not isinstance(metadata, dict):
            raise ValueError(
                f"Wrong metadata type, it must be a dict. Passed metadata={metadata}"
            )
        if level_names:
            metadata = dict(metadata or {})
            metadata["level_names"] = list(level_names)
        try:
            self._engine.create_sensor(
                database,
                sensor,
                freq=period,
                metrics=metrics,
                metadata=metadata,
                read_key=read_key,
                write_key=write_key,
                key=self.token,
            )
            return True
        except ElementAlreadyExistsError:
            return False

    def delete_sensor(self, database: str, sensor: str) -> bool:
        try:
            self._engine.delete_sensor(database, sensor, key=self.token)
            return True
        except ElementNotFoundError:
            return False

    # -- writes ---------------------------------------------------------
    def write(self, sequence: Sequence, fill_value: float = 0) -> bool:
        """Influx-format strings, or (db, sensor, columns, values,
        ts_ns) tuples (the reference's msgpack shape,
        client.py:337-382)."""
        if not sequence:
            return False
        if isinstance(sequence[0], str):
            from pyspark.sql import functions as F

            from .sources.influx import parse_lines
            from .streaming.ingest import upsert_parsed_batch

            lines = self._engine.spark.createDataFrame(
                [(s,) for s in sequence], "line string"
            )
            upsert_parsed_batch(
                self._engine, parse_lines(lines), fill_value=fill_value, key=self.token
            )
            return True
        if isinstance(sequence[0], (list, tuple)):
            by_target: dict[tuple[str, str], list] = {}
            for db, sensor, columns, values, ts_ns in sequence:
                pts = by_target.setdefault((db, sensor), [])
                for m, v in zip(columns, values):
                    pts.append((m, v, float(ts_ns) / 1e9))
            for (db, sensor), pts in by_target.items():
                self._engine.write_points(
                    db, sensor, pts, fill_value=fill_value, key=self.token
                )
            return True
        return False

    def write_df(self, db: str, sensor: str, df: pd.DataFrame, fill_value: float = 0) -> bool:
        self._engine.write_df(db, sensor, df, fill_value=fill_value, key=self.token)
        return True

    # -- metadata -------------------------------------------------------
    def config_reload(self) -> bool:
        return True  # catalog reads are always fresh (M6 is a no-op here)

    def get_metrics(self, db: str, sensor: str) -> list | None:
        try:
            return self._engine.get_metrics(db, sensor, key=self.token)
        except ElementNotFoundError:
            return None

    def get_metadata(self, db: str, sensor: str) -> dict[str, Any] | None:
        try:
            return self._engine.get_metadata(db, sensor, key=self.token)
        except ElementNotFoundError:
            return None

    def set_level_names(self, db: str, sensor: str, level_names: list[str]) -> bool:
        metadata = self.get_metadata(db, sensor) or {}
        metadata["level_names"] = list(level_names)
        self._engine.update_metadata(db, sensor, metadata, key=self.token)
        return True

    def get_lasttimestamp(self, db: str, sensor: str) -> float | None:
        return self._engine.get_last_timestamp(db, sensor, key=self.token)

    def get_lastdate(self, db: str, sensor: str, tz: str | None = None):
        ts = self.get_lasttimestamp(db, sensor)
        if ts is None:
            return None
        utc_date = pd.Timestamp.utcfromtimestamp(ts)
        if tz is None:
            return utc_date.tz_localize(None) if utc_date.tzinfo else utc_date
        return (utc_date.tz_localize("UTC") if utc_date.tzinfo is None else utc_date).tz_convert(tz)

    # -- reads ----------------------------------------------------------
    def read(
        self,
        db: str,
        sensor: str,
        date_from: pd.Timestamp,
        date_to: pd.Timestamp | None = None,
        metrics: list | None = None,
    ) -> pd.DataFrame:
        """Index tz follows date_from: naive in -> naive out
        (client.py:558-563)."""
        import time

        date_from = pd.Timestamp(date_from)
        naive = date_from.tzinfo is None
        start = (date_from.tz_localize("UTC") if naive else date_from).timestamp()
        if date_to is not None:
            date_to = pd.Timestamp(date_to)
            end = (date_to.tz_localize("UTC") if date_to.tzinfo is None else date_to).timestamp()
        else:
            # reference default: missing date_to means "now" — future-
            # dated rows stay invisible (client.read end_ts default,
            # database.py:627-631)
            end = time.time()
        out = self._engine.read_pandas(
            db, sensor, start_ts=start, end_ts=end, metrics=metrics, tz="UTC",
            key=self.token,
        )
        if naive:
            out.index = out.index.tz_localize(None)
        else:
            out.index = out.index.tz_convert(date_from.tzinfo)
        return out

    def local_read(
        self,
        db: str,
        sensor: str,
        date_from: pd.Timestamp,
        date_to: pd.Timestamp | None = None,
        metrics: list | None = None,
    ) -> pd.DataFrame:
        """In-process read that bypasses any server hop (reference
        client.py:468-491: ``local_read`` opens the local database
        directly).  The reference's own test asserts
        ``read == local_read`` on a written fixture
        (tests/test_client.py:93-112); here both paths are the engine,
        so the equality holds by construction — this method exists so
        reference code calling ``local_read`` ports verbatim, including
        the reference's post-hoc ``df.loc[:, metrics]`` column
        subsetting semantics."""
        out = self.read(db, sensor, date_from, date_to=date_to, metrics=None)
        if metrics:
            out = out.loc[:, metrics]
        return out

    def read_iter(
        self,
        db: str,
        sensor: str,
        date_from: pd.Timestamp | None = None,
        date_to: pd.Timestamp | None = None,
        metrics: list | None = None,
    ):
        """Chunk-by-chunk pandas frames — the reference's memory-
        bounded read path (database.py:579-666).  Yields frames in
        time order; concatenating them equals ``read``."""
        start = end = None
        if date_from is not None:
            d = pd.Timestamp(date_from)
            start = (d.tz_localize("UTC") if d.tzinfo is None else d).timestamp()
        if date_to is not None:
            d = pd.Timestamp(date_to)
            end = (d.tz_localize("UTC") if d.tzinfo is None else d).timestamp()
        for _, pdf in self._engine.read_iter(
            db, sensor, start_ts=start, end_ts=end, metrics=metrics, key=self.token
        ):
            yield pdf

    def read_grafana(
        self,
        db: str,
        sensor: str,
        date_from: pd.Timestamp,
        date_to: pd.Timestamp,
        max_datapoints: int = 100,
        metrics: list | None = None,
    ) -> pd.DataFrame:
        """Downsampled read (the grafana /query flow, W1)."""
        date_from, date_to = pd.Timestamp(date_from), pd.Timestamp(date_to)
        naive = date_from.tzinfo is None
        start = (date_from.tz_localize("UTC") if naive else date_from).timestamp()
        end = (date_to.tz_localize("UTC") if date_to.tzinfo is None else date_to).timestamp()
        df = self._engine.read_downsampled(
            db, sensor, start, end, max_datapoints, metrics=metrics, key=self.token
        )
        if df is None:
            return pd.DataFrame()
        pdf = df.toPandas()
        idx = pd.to_datetime((pdf["ts_sec"] * 1e9).round().astype("int64"), utc=True)
        pdf = pdf.drop(columns=["ts_sec"])
        pdf.index = idx.dt.tz_localize(None) if naive else idx.dt.tz_convert(date_from.tzinfo)
        pdf.index.name = None
        return pdf

    def update_token(self, token: str) -> None:
        self.token = token
