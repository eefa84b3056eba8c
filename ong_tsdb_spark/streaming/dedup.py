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
    exclude_batch: int | None = None,
) -> DataFrame:
    """One micro-batch of the ledger protocol: return only documents
    whose digest is NOT in the ledger, with a CONTENT-DETERMINISTIC
    representative per digest within the batch (min over the full row
    struct — the same batch yields the same row under any
    partitioning or rerun, matching the min-id policy the
    value-checked ``dedup_ledger_backfill`` registry twin pins).

    Exposed separately so the logic is unit-testable without a
    streaming query and reusable for backfill jobs."""
    fp = content_fingerprint(batch_df, text_col)
    try:
        raw = spark.read.parquet(ledger_path)
        if exclude_batch is not None and "batch" in raw.columns:
            # a REPLAYED batch must not see its own (partially
            # written) ledger partition, or the rerun anti-joins
            # against itself, emits nothing, and overwrites its
            # output directory with an empty result
            raw = raw.filter(F.col("batch") != exclude_batch)
        ledger = raw.select(FINGERPRINT_COL)
    except AnalysisException as ex:
        # ONLY path-not-found means "first batch ever" — a ledger that
        # exists but cannot be read (partial write, corruption) must
        # FAIL the batch, not silently disable dedup for it
        msg = str(ex)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        ledger = None
    data_cols = [c for c in fp.columns if c != FINGERPRINT_COL]
    fresh = (
        fp.groupBy(FINGERPRINT_COL)
        .agg(F.min(F.struct(*[F.col(c) for c in data_cols])).alias("__row"))
        .select(FINGERPRINT_COL, *[F.col(f"__row.{c}").alias(c) for c in data_cols])
    )
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
    Parquet.  Each micro-batch: anti-join against the ledger → write
    surviving documents under ``out_path/batch=N`` → write their
    digests under ``ledger_path/batch=N``.

    Restart-safe BECAUSE both writes are per-batch-directory
    OVERWRITES, i.e. idempotent: foreachBatch is at-least-once, and a
    replay of batch N (crash between the two writes, or after a
    partial one) recomputes the same anti-join against the same prior
    ledger batches and rewrites exactly its own two directories —
    plain appends here would duplicate documents on every replay.
    Readers see one partition column (``batch``) on both outputs;
    :func:`compact_ledger` folds the ledger batches down."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fresh = dedup_batch_against_ledger(
            spark, batch_df, ledger_path, text_col, exclude_batch=batch_id
        )
        # localCheckpoint: the anti-join must be evaluated BEFORE the
        # ledger write below changes what a lazy plan would read
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop(FINGERPRINT_COL).write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )
        fresh.select(FINGERPRINT_COL).write.mode("overwrite").parquet(
            f"{ledger_path}/batch={batch_id}"
        )

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_ledger(spark: SparkSession, ledger_path: str) -> int:
    """Fold the per-batch ledger partitions into one distinct-digest
    partition (``batch=-1``).  Returns the distinct digest count.

    Loss-proof against a CONCURRENTLY running stream: the batch
    directories to remove are listed BEFORE the read, so a partition
    written at any point during compaction is either included in the
    compacted set (created before the read) or left untouched on disk
    (created after the listing) — digests are never dropped.  (Local
    filesystem paths; for object stores route the delete through
    object_store.HadoopCatalog.)"""
    import os
    import shutil

    old = [
        d
        for d in os.listdir(ledger_path)
        if d.startswith("batch=") and d != "batch=-1"
    ]
    distinct = (
        spark.read.parquet(ledger_path)
        .select(FINGERPRINT_COL)
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = distinct.count()
    distinct.write.mode("overwrite").parquet(f"{ledger_path}/batch=-1")
    for d in old:
        shutil.rmtree(os.path.join(ledger_path, d), ignore_errors=True)
    return n
