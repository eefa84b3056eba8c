"""HTTP façade — the reference's Flask server surface
(src/ong_tsdb/server.py) over the Spark engine.

Route-for-route parity: influx ingest (``/influx[/fill_value]``),
range reads (``/<db>/<sensor>/read_df``), last-timestamp / metrics /
metadata, grafana ``/query`` (maxDataPoints thinning), and db/sensor
DDL — with HTTP Basic auth whose password is the token
(auth_required, server.py:91-104).

Wire format: JSON throughout. The reference ships raw ndarray bytes
base64'd + zlib (server.py:339-385) because its client must avoid
parsing overhead on a raspberry pi; a Spark-backed service talks to
clients over JSON/Arrow and SURVEY S9 records the byte-level wire as
N/A-by-design.  ``read_df`` returns ``{"dates": [epoch_s], "values":
[[...]], "metrics": [...], "metadata": {...}}`` — the same logical
payload.
"""

from __future__ import annotations

import math
from typing import Any

from flask import Flask, jsonify, request

from ..auth import NotAuthorizedError
from ..catalog import ElementAlreadyExistsError, ElementNotFoundError
from ..engine import TS_COL, OngTsdbSpark
from ..pandas_edge import flatten_metrics
from ..sources.influx import parse_lines
from ..streaming.ingest import upsert_parsed_batch


def _token() -> str | None:
    auth = request.authorization
    if auth and auth.password:
        return auth.password
    hdr = request.headers.get("Authorization", "")
    if hdr.startswith("Bearer "):
        return hdr[len("Bearer "):]
    return None


def _clean(v: float | None) -> float | None:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return v


def create_app(engine: OngTsdbSpark) -> Flask:
    app = Flask("ong_tsdb_spark")

    @app.errorhandler(NotAuthorizedError)
    def _unauthorized(e):  # noqa: ANN001
        return jsonify(error=str(e)), 401

    @app.errorhandler(ElementNotFoundError)
    def _missing(e):  # noqa: ANN001
        return jsonify(error=str(e)), 404

    @app.errorhandler(ElementAlreadyExistsError)
    def _exists(e):  # noqa: ANN001
        return jsonify(error=str(e)), 409

    # -- DDL ----------------------------------------------------------
    @app.post("/db/<db>")
    def create_db(db: str):
        engine.create_db(db, key=_token())
        return jsonify(ok=True), 201

    @app.delete("/db/<db>")
    def delete_db(db: str):
        engine.delete_db(db, key=_token())
        return jsonify(ok=True)

    @app.post("/db/<db>/sensor/<sensor>")
    def create_sensor(db: str, sensor: str):
        body: dict[str, Any] = request.get_json(force=True)
        engine.create_sensor(
            db,
            sensor,
            freq=body["period"],
            metrics=body["metrics"],
            metadata=body.get("metadata") or {},
            read_key=body.get("read_key", ""),
            write_key=body.get("write_key", ""),
            key=_token(),
        )
        return jsonify(ok=True), 201

    @app.delete("/db/<db>/sensor/<sensor>")
    def delete_sensor(db: str, sensor: str):
        engine.delete_sensor(db, sensor, key=_token())
        return jsonify(ok=True)

    @app.get("/db/<db>/exist")
    def exist_db(db: str):
        return jsonify(exists=engine.exist_db(db))

    @app.get("/db/<db>/sensor/<sensor>/exist")
    def exist_sensor(db: str, sensor: str):
        return jsonify(exists=engine.exist_sensor(db, sensor))

    # -- ingest (S5) --------------------------------------------------
    @app.post("/influx", defaults={"fill_value": 0.0})
    @app.post("/influx/<fill_value>")
    def influx(fill_value):
        fv = float("nan") if str(fill_value).lower() == "nan" else float(fill_value)
        lines = request.get_data(as_text=True).splitlines()
        lines = [l for l in lines if l.strip()]
        if not lines:
            return jsonify(ok=False, error="empty body"), 400
        ldf = engine.spark.createDataFrame([(l,) for l in lines], "line string")
        # auth: the upsert enforces per-sensor write keys with the
        # caller's token (reference server.py:214-293 decorator)
        upsert_parsed_batch(engine, parse_lines(ldf), fill_value=fv, key=_token())
        return jsonify(ok=True, points=len(lines))

    # -- reads --------------------------------------------------------
    @app.post("/<db>/<sensor>/read_df")
    def read_df(db: str, sensor: str):
        body = request.get_json(force=True) or {}
        df = engine.read(
            db,
            sensor,
            start_ts=body.get("start_ts"),
            end_ts=body.get("end_ts"),
            metrics=body.get("metrics"),
            key=_token(),
        )
        cfg = engine.catalog.get_config(db, sensor)
        metrics = body.get("metrics") or cfg.metrics
        flat = flatten_metrics(metrics)
        if df is None:
            rows = []
        else:
            rows = df.collect()
        return jsonify(
            dates=[r[TS_COL] for r in rows],
            values=[[_clean(r[m]) for m in flat] for r in rows],
            metrics=metrics,
            metadata=cfg.metadata,
        )

    @app.post("/<db>/<sensor>/last_timestamp")
    def last_timestamp(db: str, sensor: str):
        return jsonify(
            last_timestamp=engine.get_last_timestamp(db, sensor, key=_token())
        )

    @app.post("/<db>/<sensor>/metrics")
    def metrics(db: str, sensor: str):
        return jsonify(engine.get_metrics(db, sensor, key=_token()))

    @app.post("/<db>/<sensor>/metadata")
    def metadata(db: str, sensor: str):
        return jsonify(engine.get_metadata(db, sensor, key=_token()))

    @app.post("/db/<db>/sensor/<sensor>/set_metadata")
    def set_metadata(db: str, sensor: str):
        engine.update_metadata(db, sensor, request.get_json(force=True), key=_token())
        return jsonify(ok=True)

    # -- grafana /query (W1) ------------------------------------------
    @app.post("/<db>/<sensor>/query")
    def query(db: str, sensor: str):
        body = request.get_json(force=True)
        start = float(body["range"]["from"])
        end = float(body["range"]["to"])
        maxdp = int(body.get("maxDataPoints", 100))
        targets = [t["target"] for t in body.get("targets", [])] or None
        df = engine.read_downsampled(
            db, sensor, start, end, maxdp, metrics=targets, key=_token()
        )
        cfg = engine.catalog.get_config(db, sensor)
        names = flatten_metrics(targets or cfg.metrics)
        out = []
        rows = df.collect() if df is not None else []
        for m in names:
            dps = [
                [_clean(r[m]), int(r[TS_COL] * 1000)]
                for r in rows
                if _clean(r[m]) is not None  # P6: NaN skip (server.py:454)
            ]
            out.append({"target": m, "datapoints": dps})
        return jsonify(out)

    @app.get("/config_reload")
    def config_reload():
        return jsonify(ok=True)  # catalog reads are always fresh (M6)

    return app
