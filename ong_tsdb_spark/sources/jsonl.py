"""JSONL (newline-delimited JSON) corpus source/sink.

The interchange format LLM training corpora actually arrive in (one
JSON document per line, usually gzip shards).  The reference engine
has no document corpus at all — this source exists for the
training-data-pipeline surface, the same way `sources/influx.py`
exists for the reference's wire format (reference client.py:214-254
is its closest analogue: a text line-protocol ingest edge).

Spark-first: `spark.read.json` with an EXPLICIT schema — never schema
inference, which is a full extra pass over 100 TB before the real
one.  With the schema given, the JSON scan prunes unprojected fields
at parse time (Jackson token-skips them), codegen stays whole-stage,
and gzip shards decode one-per-task (gzip is not splittable —
parallelism = shard count, which is why corpora ship as many shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the canonical documents-table schema (mirrors testdata
#: documents.parquet) — JSONL shards interchange through it.
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL document corpus with the explicit schema (no
    inference pass).  Malformed lines land in ``_corrupt_record``
    (PERMISSIVE mode); by default they are dropped and the column
    removed — pass ``keep_corrupt=True`` to route them to a quarantine
    sink instead of silently losing them.  (Spark restriction: a query
    over the returned frame must reference at least one DATA column
    alongside ``_corrupt_record`` — project e.g. the id with it.)"""
    base = schema or DOCUMENTS_SCHEMA
    if keep_corrupt:
        with_corrupt = StructType(
            list(base.fields) + [StructField(CORRUPT_COL, StringType())]
        )
        return (
            spark.read.schema(with_corrupt)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    # DROPMALFORMED drops bad lines at parse time — unlike a filter on
    # the corrupt column, this survives aggressive column pruning
    # (e.g. a bare count() references no data column, and a
    # corrupt-only filter is then the disallowed corrupt-only query)
    return spark.read.schema(base).option("mode", "DROPMALFORMED").json(path)


def write_documents_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip", shards: int | None = None
) -> None:
    """Write a corpus as JSONL shards.  ``shards`` repartitions to a
    target shard count (gzip shards are the parallelism unit on
    re-read; aim for ~100-500 MB per shard at scale).  Round-robin
    repartition, not coalesce: coalesce would chain upstream stages
    into the reduced parallelism."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
