"""Incremental corpus ingestion: the streaming composition of the
batch cleaning pipeline.

JSONL shards land in a drop directory; each run (or each micro-batch
of a long-lived query) reads only the NEW shards, gates them on the
Gopher quality rules, scrubs PII, dedups against the persistent
digest ledger, and appends the survivors to the clean corpus — the
cron-style "process the backlog then stop" pattern via
``Trigger.AvailableNow``, restart-safe through the checkpoint + the
ledger's idempotent anti-join.

Every stage is stateless map-side column work except the ledger
anti-join (digests only), so the streaming plan is the same shape as
the batch plan — no new state stores beyond the file-source log.

Ordering contract: the quality gate runs BEFORE the scrub (rejected
documents pay nothing), and the dedup digest is computed on the
SCRUBBED text — two raw documents differing only in the PII that the
scrub masks ARE duplicates of each other downstream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.text import gopher_pass_expr, scrub_pii
from ..sources.jsonl import DOCUMENTS_SCHEMA
from .dedup import start_ledger_dedup


def start_corpus_ingest(
    spark: SparkSession,
    src_path: str,
    ledger_path: str,
    out_path: str,
    checkpoint_path: str,
    schema: StructType | None = None,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Start the incremental ingest query over a JSONL drop directory.
    Returns the StreamingQuery (``awaitTermination()`` it; with the
    default AvailableNow trigger it stops after draining the
    backlog)."""
    stream = spark.readStream.schema(schema or DOCUMENTS_SCHEMA).json(src_path)
    cleaned = stream.filter(gopher_pass_expr(F.col(text_col))).withColumn(
        text_col, scrub_pii(F.col(text_col))
    )
    return start_ledger_dedup(
        spark,
        cleaned,
        ledger_path=ledger_path,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        text_col=text_col,
        trigger_available_now=trigger_available_now,
    )
