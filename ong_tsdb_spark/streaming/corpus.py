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
):
    """The END-TO-END incremental pipeline: JSONL drop directory →
    Gopher gate → PII scrub → persistent-ledger dedup → pre-tokenized
    fixed-length shards, one micro-batch at a time.

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
    append.  On replay, a batch whose DOC output committed but whose
    marker is missing re-appends from the COMMITTED output (not a
    recompute); the append itself is replay-tolerant because the
    layout is deterministic given (meta.total_tokens, docs) and the
    boundary doc count rides the atomically-committed meta.

    Ordering contract: source ``doc_id`` must be strictly increasing
    across the stream (enforced by append — the training order IS
    doc_id order)."""
    import os as _os

    from ..plans import tokenized_shards as _tsh
    from .dedup import FINGERPRINT_COL, dedup_batch_against_ledger
    from .dedup import _fs as _ledger_fs

    stream = spark.readStream.schema(schema or DOCUMENTS_SCHEMA).json(src_path)
    cleaned = stream.filter(gopher_pass_expr(F.col(text_col))).withColumn(
        text_col, scrub_pii(F.col(text_col))
    )

    def _append_docs(docs_df) -> None:
        if not docs_df.take(1):
            return
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
            )

    def process(batch_df, batch_id: int) -> None:
        out_dir = f"{out_path}/batch={batch_id}"
        marker = _os.path.join(shards_path, f"_shards_batch_{batch_id}")
        if _ledger_fs(spark, out_path).exists(f"{out_dir}/_SUCCESS"):
            # replay of a committed batch: ledger partition is
            # idempotent; the shard append re-runs from the COMMITTED
            # output only if its marker never landed
            spark.read.parquet(out_dir).select(
                F.md5(F.col(text_col)).alias(FINGERPRINT_COL)
            ).distinct().write.mode("overwrite").parquet(
                f"{ledger_path}/batch={batch_id}"
            )
            if not _os.path.exists(marker):
                _append_docs(spark.read.parquet(out_dir))
                open(marker, "w").close()
            return

        fresh = dedup_batch_against_ledger(
            spark, batch_df, ledger_path, text_col, exclude_batch=batch_id
        ).localCheckpoint(eager=True)
        docs_only = fresh.drop(FINGERPRINT_COL)
        docs_only.write.mode("overwrite").parquet(out_dir)
        fresh.select(FINGERPRINT_COL).write.mode("overwrite").parquet(
            f"{ledger_path}/batch={batch_id}"
        )
        _append_docs(docs_only)
        open(marker, "w").close()

    writer = cleaned.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
