"""Streaming deduplication for at-least-once document sources.

Two tiers, matching the two real deployment shapes:

* :func:`content_dedup_stream` — IN-MEMORY bounded state via
  ``dropDuplicatesWithinWatermark``: duplicates arriving within the
  watermark horizon are dropped, state is purged as the watermark
  advances.  Right for re-delivery windows (a Kafka source redelivers
  within minutes, not days).

* :func:`start_ledger_dedup` — UNBOUNDED horizon with state in
  STORAGE: every micro-batch anti-joins its content digests against a
  persistent digest ledger, emits only first-seen documents, and
  appends the new digests.  This is the production pattern when "have
  we ever seen this document" must survive restarts and span months of
  ingest — state lives in Parquet (16-byte digests, not documents), so
  it scales with *distinct corpus content* and is shared by every
  executor via an equi-join instead of per-partition memory.

Scale shape: both tiers key on the md5 content digest computed
map-side; the ledger join is digest ⋈ digest (left_anti), so shuffle
volume is digests only.  The ledger append is idempotent for
correctness (replayed batches re-emit nothing: their digests are
already present — at worst the ledger gains duplicate digest ROWS,
which the anti-join tolerates and :func:`compact_ledger` removes).

Reference scope note: the reference engine has no streaming dedup (its
ingest is last-write-wins upsert, server.py post routes); this extends
the streaming surface per the training-data-pipeline mandate, like
operators/dedup.py does for batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

FINGERPRINT_COL = "__fp"


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the md5 content digest (map-side, 16 bytes)."""
    return df.withColumn(FINGERPRINT_COL, F.md5(F.col(text_col)))


def content_dedup_stream(
    docs: DataFrame,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Bounded-state streaming dedup: drop any document whose content
    digest was already seen within the watermark horizon.  State is
    per-digest and purged as the watermark advances — safe for
    indefinite uptime.  Duplicates straggling in LATER than the
    horizon are passed through (use :func:`start_ledger_dedup` when
    that matters)."""
    return (
        content_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark([FINGERPRINT_COL])
        .drop(FINGERPRINT_COL)
    )


def dedup_batch_against_ledger(
    spark: SparkSession,
    batch_df: DataFrame,
    ledger_path: str,
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch of the ledger protocol: return only documents
    whose digest is NOT in the ledger, first occurrence per digest
    within the batch (smallest-row wins is irrelevant here — any one
    representative is correct, and dropDuplicates picks one
    deterministically per batch content since the digest decides).

    Exposed separately so the logic is unit-testable without a
    streaming query and reusable for backfill jobs."""
    fp = content_fingerprint(batch_df, text_col)
    try:
        ledger = spark.read.parquet(ledger_path).select(FINGERPRINT_COL)
    except AnalysisException:
        ledger = None  # first batch ever: no ledger yet
    fresh = fp.dropDuplicates([FINGERPRINT_COL])
    if ledger is not None:
        fresh = fresh.join(ledger, on=FINGERPRINT_COL, how="left_anti")
    return fresh


def start_ledger_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    ledger_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Unbounded-horizon streaming dedup with the digest ledger in
    Parquet.  Each micro-batch: anti-join against the ledger → append
    surviving documents to ``out_path`` → append their digests to the
    ledger.  Restart-safe: a replayed batch finds its digests already
    in the ledger and emits nothing new (the ledger may accumulate
    duplicate digest ROWS on replay — harmless for the anti-join;
    run :func:`compact_ledger` periodically)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fresh = dedup_batch_against_ledger(spark, batch_df, ledger_path, text_col)
        # localCheckpoint: the anti-join must be evaluated BEFORE the
        # ledger append below changes what it reads (lazy evaluation
        # would otherwise let the output write observe the new ledger)
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop(FINGERPRINT_COL).write.mode("append").parquet(out_path)
        fresh.select(FINGERPRINT_COL).write.mode("append").parquet(ledger_path)

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_ledger(spark: SparkSession, ledger_path: str) -> int:
    """Rewrite the ledger with distinct digests (replayed batches can
    leave duplicate rows).  Returns the distinct digest count."""
    distinct = spark.read.parquet(ledger_path).distinct().localCheckpoint(eager=True)
    n = distinct.count()
    distinct.write.mode("overwrite").parquet(ledger_path)
    return n
