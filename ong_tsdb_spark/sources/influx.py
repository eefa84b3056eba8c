"""S5 — InfluxDB line-protocol source.

The reference parses ``db,key=sensor m1=v1,m2=v2 ts_ns`` lines one at
a time in Python (server_utils.py:8-25).  Spark-first: the whole batch
is a string column and the parse is split/regexp/transform column
expressions — vectorized JVM-side, usable identically in batch reads
and Structured Streaming (socket/Kafka/file sources).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: parsed long schema: one row per (point, metric)
PARSED_COLS = ["db", "sensor", "metric", "value", "ts_ns"]


def format_lines(
    df: DataFrame,
    db: Column,
    sensor: Column,
    metric_value_pairs: list[tuple[str, Column]],
    ts_ns: Column,
) -> DataFrame:
    """Inverse of parse — render rows as influx protocol lines (the
    client's write-side format, client.py:337-366)."""
    fields = F.concat_ws(
        ",",
        *[F.concat(F.lit(name + "="), v.cast("string")) for name, v in metric_value_pairs],
    )
    line = F.concat(
        db, F.lit(",key="), sensor, F.lit(" "), fields, F.lit(" "), ts_ns.cast("string")
    )
    return df.select(line.alias("line"))


def parse_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse influx lines into long form (db, sensor, metric, value,
    ts_ns) — one output row per metric, like split_influx
    (server_utils.py:8-25).  Missing timestamp -> NULL ts_ns (the
    reference substitutes server time; that policy belongs to the
    ingest caller, not the parser).

    MALFORMED-TOLERANT (code-review r9): an ingest endpoint sees
    arbitrary garbage, and one bad line must not ANSI-kill the batch —
    a line without a field section made ``element_at(head, 2)`` throw,
    a field group without '=' made the value extraction throw, and a
    non-numeric timestamp or value made the plain cast throw.  Every
    positional pick is ``try_element_at`` and every numeric cast a
    ``try_cast``: garbage parses to NULL cells for the caller to
    filter, never an exception."""
    l = F.col(line_col)
    head = F.split(l, " ")
    tags = F.try_element_at(head, F.lit(1))
    fields = F.try_element_at(head, F.lit(2))
    ts = F.try_element_at(head, F.lit(3)).try_cast("long")
    db = F.try_element_at(F.split(tags, ","), F.lit(1))
    # sensor is the value of the first tag (reference takes the part
    # after '=' of the second comma-group)
    sensor = F.regexp_extract(tags, r",[^=]+=([^,]+)", 1)
    kv = F.explode(F.split(fields, ",")).alias("kv")
    out = lines.select(
        db.alias("db"), sensor.alias("sensor"), ts.alias("ts_ns"), kv
    ).select(
        "db",
        "sensor",
        F.try_element_at(F.split(F.col("kv"), "="), F.lit(1)).alias("metric"),
        F.try_element_at(F.split(F.col("kv"), "="), F.lit(2))
        .try_cast("double")
        .alias("value"),
        "ts_ns",
    )
    return out.select(*PARSED_COLS)
