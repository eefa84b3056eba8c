"""Incremental corpus ingestion: the streaming composition of the
batch cleaning pipeline.

JSONL shards land in a drop directory; each run (or each micro-batch
of a long-lived query) reads only the NEW shards, gates them on the
configured quality rule-set (Gopher rules by default; the hashed
linear classifier or any custom boolean column via ``quality_gate`` —
see :func:`gate_expr`), scrubs PII, dedups against the persistent
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

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.text import classifier_pass_expr, gopher_pass_expr, scrub_pii
from ..sources.jsonl import DOCUMENTS_SCHEMA
from .dedup import start_ledger_dedup


def gate_expr(quality_gate, text_col: str) -> Column:
    """Resolve the pipeline's quality gate: ``"gopher"`` (rule-based,
    the default), ``"classifier"`` (the hashed linear model —
    model-based filtering in the stream at zero extra state), both
    (``"gopher+classifier"``, conjunction), or any custom boolean
    Column.  All three named gates are pure column expressions, so
    the streaming plan stays stateless map-side work regardless of
    choice."""
    if isinstance(quality_gate, Column):
        return quality_gate
    t = F.col(text_col)
    if quality_gate == "gopher":
        return gopher_pass_expr(t)
    if quality_gate == "classifier":
        return classifier_pass_expr(t)
    if quality_gate == "gopher+classifier":
        return gopher_pass_expr(t) & classifier_pass_expr(t)
    raise ValueError(
        f"unknown quality_gate {quality_gate!r}: expected 'gopher', "
        "'classifier', 'gopher+classifier' or a boolean Column"
    )


def start_corpus_to_shards(
    spark: SparkSession,
    src_path: str,
    ledger_path: str,
    out_path: str,
    checkpoint_path: str,
    shards_path: str,
    schema: StructType | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: dict[str, int] | None = None,
    vocab_size: int = 65_000,
    seq_len: int = 4096,
    bins_per_shard: int = 2048,
    trigger_available_now: bool = True,
    quality_gate="gopher",
    merges: list[tuple[str, str]] | None = None,
):
    """The END-TO-END incremental pipeline: JSONL drop directory →
    quality gate (see :func:`gate_expr`; Gopher rules by default) →
    PII scrub → persistent-ledger dedup → pre-tokenized fixed-length
    shards, one micro-batch at a time.

    Each batch runs the ledger protocol exactly as
    :func:`start_corpus_ingest` (idempotent per-batch directories),
    then APPENDS the surviving documents to the shard directory via
    ``plans.tokenized_shards.append_tokenized_shards`` — the stream
    resumes mid-sequence, ids stay stable under the pinned
    vocabulary, and only the boundary shard is rewritten.

    First batch bootstraps the shard directory; ``vocab`` should be a
    pre-trained token->id dict for production (a vocabulary trained
    on the first batch alone is a bad vocabulary — pass one), but
    defaults to training on that first batch so tests and small jobs
    work out of the box.

    Crash safety: a ``_shards_batch_N`` marker commits each shard
    append.  The ledger protocol itself runs inside
    :func:`start_ledger_dedup` (ONE implementation — this function
    only supplies the ``on_batch_committed`` callback); on replay of
    a committed batch whose marker never landed, the append re-runs
    from the COMMITTED output (not a recompute), and
    ``append_tokenized_shards`` itself treats a batch whose ids are
    already recorded as a no-op, so the
    crash-after-meta-before-marker window is also safe.

    Ordering contract: source ``doc_id`` must be strictly increasing
    across the stream (enforced by append — the training order IS
    doc_id order).  ``shards_path`` is a LOCAL (or mounted)
    filesystem path: the sidecar/marker files use plain ``open``,
    unlike the ledger paths which go through the Hadoop FS API."""
    import os as _os

    from ..plans import tokenized_shards as _tsh

    stream = spark.readStream.schema(schema or DOCUMENTS_SCHEMA).json(src_path)
    cleaned = stream.filter(gate_expr(quality_gate, text_col)).withColumn(
        text_col, scrub_pii(F.col(text_col))
    )

    def on_committed(docs_df, batch_id: int) -> None:
        _os.makedirs(shards_path, exist_ok=True)
        marker = _os.path.join(shards_path, f"_shards_batch_{batch_id}")
        if _os.path.exists(marker):
            return
        if docs_df.take(1):
            if _os.path.exists(_os.path.join(shards_path, "_tokenizer_meta.json")):
                _tsh.append_tokenized_shards(
                    docs_df, shards_path, text_col=text_col, id_col=id_col
                )
            else:
                _tsh.write_tokenized_shards(
                    docs_df,
                    shards_path,
                    vocab_size=vocab_size,
                    seq_len=seq_len,
                    bins_per_shard=bins_per_shard,
                    text_col=text_col,
                    id_col=id_col,
                    vocab=vocab,
                    merges=merges,
                )
        open(marker, "w").close()

    return start_ledger_dedup(
        spark,
        cleaned,
        ledger_path=ledger_path,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        text_col=text_col,
        trigger_available_now=trigger_available_now,
        on_batch_committed=on_committed,
    )


def start_corpus_ingest(
    spark: SparkSession,
    src_path: str,
    ledger_path: str,
    out_path: str,
    checkpoint_path: str,
    schema: StructType | None = None,
    text_col: str = "text",
    trigger_available_now: bool = True,
    quality_gate="gopher",
):
    """Start the incremental ingest query over a JSONL drop directory.
    Returns the StreamingQuery (``awaitTermination()`` it; with the
    default AvailableNow trigger it stops after draining the
    backlog)."""
    stream = spark.readStream.schema(schema or DOCUMENTS_SCHEMA).json(src_path)
    cleaned = stream.filter(gate_expr(quality_gate, text_col)).withColumn(
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
