"""Streaming deduplication for at-least-once document sources.

Three tiers, matching the real deployment shapes:

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

* :func:`start_near_ledger_dedup` — the same unbounded ledger
  protocol with MinHash BAND KEYS as the state: documents that are
  merely similar (edited boilerplate, templated pages) to anything in
  the ingest history are dropped, not just byte-identical ones.  Keys
  come from the proven batch MinHash tables (one BATCH-sized doc-keyed
  aggregate per micro-batch); bootstrap a ledger from history with
  :func:`near_band_keys_table` so family AND key encoding agree.

Scale shape: all tiers key on small digests computed
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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

FINGERPRINT_COL = "__fp"


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem façade for ``path`` — all filesystem probes
    and deletes in this module go through it so the protocol works on
    object-store URIs (s3a://, hdfs://), not just local paths."""
    from ..object_store import HadoopFs

    return HadoopFs(spark, path)


def _has_data_files(fs, path: str) -> bool:
    """Whether any non-hidden FILE exists under ``path`` (recursing
    through subdirectories; ``_``/``.`` entries are Spark metadata or
    in-flight temporaries).  Distinguishes a truly empty ledger
    (benign) from one whose data files were lost (must fail)."""
    for e in fs.listdir(path):
        if e.startswith(("_", ".")):
            continue
        full = f"{path}/{e}"
        if fs.isdir(full):
            if _has_data_files(fs, full):
                return True
        else:
            return True
    return False


def _is_orderable(dt) -> bool:
    """Whether Spark can ORDER on this type (maps cannot; arrays and
    structs can iff their element/field types can)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _is_orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_is_orderable(f.dataType) for f in dt.fields)
    return True


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the md5 content digest (map-side, 16 bytes).  NULL text
    digests as the empty string: md5(NULL) is NULL, and NULL join keys
    never match, so null-text documents would bypass every ledger tier
    FOREVER (re-emitted each batch, NULL rows accumulating in the
    ledger).  Treating them as '' dedups them against each other and
    against genuinely empty documents — the only consistent reading."""
    return df.withColumn(
        FINGERPRINT_COL, F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )


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
    whose digest is NOT in the ledger, with a deterministic
    representative per digest within the batch: min_by over the
    ORDERABLE columns — the same batch yields the same row under any
    partitioning or rerun, matching the min-id policy the
    value-checked ``dedup_ledger_backfill`` registry twin pins.
    Determinism caveat: rows identical on EVERY orderable column but
    differing in a map-typed payload tie (maps cannot be ordered);
    any of them is a correct representative, but which one is not
    pinned across reruns.

    Exposed separately so the logic is unit-testable without a
    streaming query and reusable for backfill jobs."""
    fp = content_fingerprint(batch_df, text_col)
    ledger = _read_ledger(spark, ledger_path, exclude_batch)
    fresh = _representatives(fp)
    if ledger is not None:
        fresh = fresh.join(ledger, on=FINGERPRINT_COL, how="left_anti")
    return fresh


def _read_ledger(
    spark: SparkSession, ledger_path: str, exclude_batch: int | None
) -> DataFrame | None:
    """The ledger's key column, or None when no ledger exists yet —
    shared by the exact (content-digest) and near-dup (band-key)
    tiers so the bootstrap/corruption semantics cannot diverge."""
    try:
        raw = spark.read.parquet(ledger_path)
        if exclude_batch is not None and "batch" in raw.columns:
            # a REPLAYED batch must not see its own (partially
            # written) ledger partition, or the rerun anti-joins
            # against itself, emits nothing, and overwrites its
            # output directory with an empty result
            raw = raw.filter(F.col("batch") != exclude_batch)
        return raw.select(FINGERPRINT_COL)
    except AnalysisException as ex:
        # path-not-found = first batch ever.  UNABLE_TO_INFER_SCHEMA
        # means no committed parquet files — but that is only benign
        # when the directory is TRULY empty (pre-created by ops, or a
        # crash before the very first commit).  A directory that still
        # contains entries (data-file wreckage, batch subdirectories)
        # had a ledger that is now unreadable — fail the batch loudly
        # instead of silently disabling dedup.
        msg = str(ex)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        if "UNABLE_TO_INFER_SCHEMA" in msg:
            if _has_data_files(_fs(spark, ledger_path), ledger_path):
                raise
            return None  # truly empty (possibly empty batch subdirs)
        raise


def _representatives(fp: DataFrame) -> DataFrame:
    """One content-deterministic representative row per digest:
    min_by over the ORDERABLE columns (a bare min(struct) would fail
    analysis on map-typed payload columns, which need no ordering to
    ride along) — the same batch yields the same row under any
    partitioning or rerun."""
    data_cols = [c for c in fp.columns if c != FINGERPRINT_COL]
    orderable = [c for c in data_cols if _is_orderable(fp.schema[c].dataType)]
    row = F.struct(*[F.col(c) for c in data_cols])
    if orderable:
        agg = F.min_by(row, F.struct(*[F.col(c) for c in orderable]))
    else:  # no orderable payload at all: any single representative
        agg = F.min_by(row, F.col(FINGERPRINT_COL))
    return (
        fp.groupBy(FINGERPRINT_COL)
        .agg(agg.alias("__row"))
        .select(FINGERPRINT_COL, *[F.col(f"__row.{c}").alias(c) for c in data_cols])
    )


def start_ledger_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    ledger_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    trigger_available_now: bool = True,
    trigger_processing_time: str | None = None,
    on_batch_committed=None,
    select_batch=None,
    keys_of=None,
):
    """Unbounded-horizon streaming dedup with the digest ledger in
    Parquet.  Each micro-batch: anti-join against the ledger → write
    surviving documents under ``out_path/batch=N`` → write their
    digests under ``ledger_path/batch=N``.

    The PROTOCOL (per-batch idempotent directories, replay
    short-circuit, crash windows) is tier-agnostic; the exact-digest
    tier is the default and :func:`start_near_ledger_dedup` plugs in
    band keys via the two hooks:

    * ``select_batch(spark, batch_df, ledger_path, text_col,
      exclude_batch) -> DataFrame`` — the surviving documents of a
      batch (no key column);
    * ``keys_of(docs_df, text_col) -> DataFrame`` — the ledger keys
      (column ``__fp``) those documents contribute.  MUST be a pure
      deterministic function of the documents: the replay path
      re-derives keys from the COMMITTED output with it.

    Restart-safe BECAUSE both writes are per-batch-directory
    OVERWRITES, i.e. idempotent: foreachBatch is at-least-once, and a
    replay of batch N (crash between the two writes, or after a
    partial one) recomputes the same anti-join against the same prior
    ledger batches and rewrites exactly its own two directories —
    plain appends here would duplicate documents on every replay.
    Readers see one partition column (``batch``) on both outputs;
    :func:`compact_ledger` folds the ledger batches down.

    ``on_batch_committed(docs_df, batch_id)``, if given, runs after a
    batch's document output and ledger partition are both durable —
    on the ORIGINAL run and again on every replay of that batch (with
    the committed output re-read, not recomputed), so the callback
    must be idempotent per batch_id.  This is the extension point the
    shard-append pipeline (streaming/corpus.py) hangs off, keeping
    the crash-safety-critical ledger protocol in exactly one place."""
    if select_batch is None:

        def select_batch(spark, batch_df, ledger_path, text_col, exclude_batch):
            return dedup_batch_against_ledger(
                spark, batch_df, ledger_path, text_col, exclude_batch
            ).drop(FINGERPRINT_COL)

    if keys_of is None:

        def keys_of(docs_df, text_col):
            # same null handling as content_fingerprint — the replay
            # path re-derives keys with this and they must agree
            return docs_df.select(
                F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(
                    FINGERPRINT_COL
                )
            ).distinct()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # A COMMITTED output directory means this is a replay whose
        # output already landed — recomputing it could now be wrong
        # (compact_ledger may have folded this batch's digests into a
        # compacted partition, where the self-exclusion below cannot
        # see them, making the recomputed batch empty); keep the
        # committed output and only (re)write the idempotent ledger
        # partition.  The probe goes through the Hadoop FS API so it
        # works on object-store URIs, not just local paths.
        out_dir = f"{out_path}/batch={batch_id}"
        if _fs(spark, out_path).exists(f"{out_dir}/_SUCCESS"):
            # re-derive the keys from the committed output, NOT a
            # recomputation: they are the batch's true contribution
            keys_of(spark.read.parquet(out_dir), text_col).write.mode(
                "overwrite"
            ).parquet(f"{ledger_path}/batch={batch_id}")
            if on_batch_committed is not None:
                on_batch_committed(spark.read.parquet(out_dir), batch_id)
            return

        docs_only = select_batch(
            spark, batch_df, ledger_path, text_col, batch_id
        )
        # localCheckpoint: the anti-join must be evaluated BEFORE the
        # ledger write below changes what a lazy plan would read
        docs_only = docs_only.localCheckpoint(eager=True)
        docs_only.write.mode("overwrite").parquet(out_dir)
        keys_of(docs_only, text_col).write.mode("overwrite").parquet(
            f"{ledger_path}/batch={batch_id}"
        )
        if on_batch_committed is not None:
            on_batch_committed(docs_only, batch_id)

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    # trigger choice is orthogonal to the protocol: availableNow
    # (drain-and-stop, the batch-replay/test default) vs a LONG-LIVED
    # processing-time query that keeps polling the source — same
    # foreachBatch, same per-batch idempotent directories
    if trigger_processing_time is not None:
        writer = writer.trigger(processingTime=trigger_processing_time)
    elif trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _local_dir(path: str) -> str | None:
    """Local filesystem directory behind ``path``, or None for a
    remote/object-store URI (where the lockfile protocol does not
    apply — see locks.py's conditional-PUT note).

    Hadoop normalizes ``file://`` URIs to the single-slash form
    ``file:/path`` (no netloc), so both spellings — and the rare
    ``file://localhost/path`` — must resolve to the local directory;
    a bare ``'://' not in path`` test misclassified ``file:/path`` as
    local-with-scheme-prefix and the compaction lock was silently
    skipped on a genuinely local ledger (ADVICE r13)."""
    if path.startswith("file:"):
        from urllib.parse import urlparse

        parsed = urlparse(path)
        if parsed.netloc not in ("", "localhost"):
            return None  # remote file://host/... — not this machine
        return parsed.path or None
    if "://" not in path:
        return path
    return None


def compact_ledger(
    spark: SparkSession,
    ledger_path: str,
    *,
    wait: bool = False,
    lock_timeout: float = 60.0,
    lock_stale_after: float | None = None,
) -> int:
    """Fold the ledger down to distinct digests.  Returns the distinct
    digest count, or ``-1`` when another compactor already holds the
    ledger lock and ``wait`` is False.

    Concurrent compactions are SINGLE-WINNER (VERDICT r12 #7): on a
    local ledger an exclusive heartbeating lockfile (``_writer.lock``
    via :class:`~ong_tsdb_spark.locks.SensorFileLock`; the ``_`` prefix
    keeps it invisible to parquet listing) serializes compactors —
    without it two racers compute the SAME fresh partition id
    ``batch=-K`` and their overwrite/delete cycles interleave
    destructively (the one genuinely unsafe window in an otherwise
    crash-safe protocol).  The loser returns ``-1`` immediately
    (``wait=False``, the cron-job default: the winner's fold covers
    its work) or blocks up to ``lock_timeout`` (``wait=True``) and
    compacts after the winner.  On an object-store URI the lock is
    skipped — serialize compaction cron jobs externally there.  A
    compactor killed outright (not an exception — those release in
    the ``finally``) leaves its lockfile until the locks.py stale
    horizon; ``wait=True`` with a ``lock_timeout`` past that horizon
    rides the stale-break, the non-waiting cron default just keeps
    returning ``-1`` until then (digests are never at risk — only
    folding is deferred).  ``lock_stale_after`` overrides the horizon
    (seconds; default the locks.py 30-min
    :data:`~ong_tsdb_spark.locks.DEFAULT_STALE_AFTER`) — keep it well
    above worst-case compaction wall time, since breaking a merely
    slow holder opens a dual-compactor window.

    Streaming (per-batch-partitioned) layout — CRASH-SAFE at every
    point: the compacted set is written to a FRESH negative partition
    (``batch=-K``, K descending per compaction — never an in-place
    overwrite, whose delete-then-write window would destroy every
    previously compacted digest on a mid-write crash), and only source
    directories that were COMMITTED (_SUCCESS) at listing time are
    removed afterwards.  An in-flight concurrent partition is left
    untouched; a crash anywhere leaves at worst duplicate digest ROWS
    (harmless for the anti-join — the next compaction folds them).
    All probes/deletes go through the Hadoop FS API, so object-store
    URIs work.

    Flat layout (root-level part files — the sequential backfill
    pattern of :func:`dedup_batch_against_ledger` with ``append``):
    rewritten via a sibling temp dir + file swap when the lock is
    held, so ``_writer.lock`` (and ``_version``) stay in place for the
    whole critical section — a plain ``overwrite`` of the root would
    delete the held lockfile and let a second compactor race the
    in-flight rewrite (ADVICE r13).  Still NOT crash-safe mid-swap —
    backfills are sequential, rerunnable jobs, and the streaming
    layout is the durable protocol."""
    from ..locks import SensorFileLock, SensorLockTimeout

    fs = _fs(spark, ledger_path)
    # a missing or not-yet-committed ledger is a benign no-op for a
    # maintenance job (ops pre-created the dir, or compaction cron ran
    # before the first streaming commit) — the same bootstrap semantics
    # _read_ledger implements for the batch path; real wreckage (data
    # files that cannot be read) still raises through _read_ledger
    if not fs.exists(ledger_path):
        return 0
    lock = None
    local = _local_dir(ledger_path)
    if local is not None and os.path.isdir(local):
        lock_kw = (
            {} if lock_stale_after is None
            else {"stale_after": lock_stale_after}
        )
        lock = SensorFileLock(
            local, timeout=lock_timeout if wait else 0.0, **lock_kw
        )
        try:
            lock.acquire()
        except SensorLockTimeout:
            if not wait:
                return -1  # another compactor is the winner
            raise
    try:
        ledger = _read_ledger(spark, ledger_path, exclude_batch=None)
        if ledger is None:
            return 0
        entries = fs.listdir(ledger_path)
        batch_dirs = [d for d in entries if d.startswith("batch=")]
        committed = [
            d
            for d in batch_dirs
            if fs.exists(f"{ledger_path}/{d}/_SUCCESS")
        ]
        distinct = ledger.distinct().localCheckpoint(eager=True)
        n = distinct.count()
        if batch_dirs:
            neg = [
                int(d.split("=", 1)[1])
                for d in batch_dirs
                if d.split("=", 1)[1].lstrip("-").isdigit() and "=-" in d
            ]
            k = (min(neg) - 1) if neg else -1
            distinct.write.mode("overwrite").parquet(f"{ledger_path}/batch={k}")
            for d in committed:
                if d != f"batch={k}":
                    fs.delete(f"{ledger_path}/{d}", recursive=True)
        elif lock is not None:
            # flat layout under the held lock: overwrite-in-place would
            # unlink _writer.lock mid-critical-section.  Write to a
            # sibling temp dir, clear the data files (keeping the lock
            # and version markers), and move the new files in — the
            # lockfile's directory stays intact while the lock is held.
            from ..locks import LOCK_NAME, VERSION_NAME

            tmp = ledger_path.rstrip("/") + "__compact_tmp"
            distinct.write.mode("overwrite").parquet(tmp)
            keep = {LOCK_NAME, VERSION_NAME}
            for e in fs.listdir(ledger_path):
                if e not in keep:
                    fs.delete(f"{ledger_path}/{e}", recursive=True)
            tmp_local = _local_dir(tmp)
            assert local is not None and tmp_local is not None
            for e in os.listdir(tmp_local):
                os.replace(
                    os.path.join(tmp_local, e), os.path.join(local, e)
                )
            fs.delete(tmp, recursive=True)
        else:
            # no lockfile exists on a remote flat ledger — plain
            # overwrite (flat compaction there remains unserialized,
            # as the object-store note in locks.py documents)
            distinct.write.mode("overwrite").parquet(ledger_path)
        return n
    finally:
        if lock is not None:
            lock.release()



# ----------------------------------------------------------------------
# near-dup tier: MinHash band keys in the ledger
# ----------------------------------------------------------------------

#: Near-dup tier parameters: 16 minhashes in 4 bands of 4 over 4-word
#: shingles, tuned for ~0.5+ Jaccard recall.  NOTE these differ from
#: the batch LSH pipeline's OWN defaults (shingle n=3, band_size=2),
#: and the ledger key is md5("b{b}|h..H") — so bootstrap a ledger from
#: history with :func:`near_band_keys_table` / :func:`near_keys_of`
#: (which share the hash family AND the key encoding), never from the
#: batch pipeline's band_signatures output directly.
NEAR_NUM_HASHES = 16
NEAR_BAND_SIZE = 4
NEAR_SHINGLE_K = 4


def near_band_keys_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = NEAR_NUM_HASHES,
    band_size: int = NEAR_BAND_SIZE,
    shingle_k: int = NEAR_SHINGLE_K,
) -> DataFrame:
    """(id, __fp) band keys per document, built on the PROVEN batch
    MinHash tables (shingle_table -> wide_minhash_table) rather than a
    per-row expression: the per-row fold variant re-evaluated the
    shingle pipeline once per hash chain and hashed 4x more than
    needed — exactly the lambda-capture recompute trap
    operators/dedup.py documents — while the batch tables hash each
    shingle once per digest-seed and aggregate map-side.  Cost per
    micro-batch: one doc-keyed aggregate (batch-sized, not
    corpus-sized).

    Documents too short to shingle (< shingle_k words) get ONE exact
    content key — they dedup exactly, never approximately.  The key is
    md5 of ``b{band}|h..h`` (or ``exact|text``), 32 hex chars like the
    exact tier's digests."""
    from ..operators.dedup import shingle_table, wide_minhash_table

    # NULL text -> '' up front: split(NULL) is NULL so the short-doc
    # filter below would drop null-text docs from BOTH paths, leaving
    # them keyless — unmatchable forever (same rationale as
    # content_fingerprint's coalesce)
    base = df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    sh = shingle_table(base, text_col=text_col, id_col=id_col, n=shingle_k)
    wide = wide_minhash_table(sh, id_col=id_col, num_hashes=num_hashes)
    n_bands = num_hashes // band_size
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(f"b{b}"),
                    *[
                        F.col(f"h{i}")
                        for i in range(b * band_size, (b + 1) * band_size)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    banded = wide.select(F.col(id_col), F.explode(keys).alias(FINGERPRINT_COL))
    shorts = base.filter(
        F.size(F.split(F.col(text_col), " ")) < shingle_k
    ).select(
        F.col(id_col),
        F.md5(F.concat(F.lit("exact|"), F.col(text_col))).alias(FINGERPRINT_COL),
    )
    return banded.unionByName(shorts)


def near_dedup_batch_against_ledger(
    spark: SparkSession,
    batch_df: DataFrame,
    ledger_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_batch: int | None = None,
    return_keys: bool = False,
):
    """One micro-batch of the NEAR-DUP ledger protocol: exact
    within-batch dedup (content-digest representative, as the exact
    tier), then drop every document sharing >= 1 band key with the
    ledger.  Survivors contribute ALL their band keys.

    Semantics note (documented limitation): two NEAR-duplicates
    arriving in the SAME micro-batch both survive — batch-internal
    near-dup needs the iterative clustering of the batch operators
    (operators/graph) and is out of scope for per-batch streaming
    work; they are exact-deduped, and either would have been dropped
    had it arrived one batch later.

    Scale shape: one batch-sized minhash aggregate, the band-key
    semi-join against the ledger (32-hex keys x n_bands per doc) and
    the id anti-join back — document text crosses the wire once, to
    its output file.

    With ``return_keys`` the CHECKPOINTED (id, __fp) band-key table of
    the batch representatives comes back too (None when no ledger
    exists yet and keys were never built) — so the ledger-write step
    can derive the survivors' keys by an id semi-join instead of
    re-running the whole shingle+minhash aggregate, the dominant
    per-batch cost (code-review r9)."""
    fp = content_fingerprint(batch_df, text_col)
    reps = _representatives(fp).drop(FINGERPRINT_COL)
    ledger = _read_ledger(spark, ledger_path, exclude_batch)
    if ledger is None:
        return (reps, None) if return_keys else reps
    # checkpoint: the keys table feeds the dup-id semi-join now AND
    # (via return_keys) the survivors' ledger keys after the output
    # write — without it the minhash aggregate runs once per consumer
    keys = near_band_keys_table(reps, text_col, id_col).localCheckpoint(
        eager=True
    )
    dup_ids = (
        keys.join(ledger, on=FINGERPRINT_COL, how="left_semi")
        .select(id_col)
        .distinct()
    )
    out = reps.join(dup_ids, on=id_col, how="left_anti")
    return (out, keys) if return_keys else out


def near_keys_of(
    docs_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Ledger keys of a committed batch: every band key of every
    surviving document (pure function of the documents — the replay
    path depends on that)."""
    return (
        near_band_keys_table(docs_df, text_col, id_col)
        .select(FINGERPRINT_COL)
        .distinct()
    )


def start_near_ledger_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    ledger_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
    trigger_processing_time: str | None = None,
    on_batch_committed=None,
):
    """:func:`start_ledger_dedup` with the NEAR-DUP tier plugged in:
    the ledger stores MinHash band keys, so re-drops catch documents
    that are merely similar (edited boilerplate, templated pages)
    across the whole ingest history, not just byte-identical ones.
    Same crash/replay protocol (incl. the long-lived
    ``trigger_processing_time`` option), same compact_ledger
    maintenance — only the key function differs.

    Hot-path cost: the batch's band keys are computed ONCE — the
    select hook checkpoints them, and the ledger-key hook derives the
    survivors' keys by an id semi-join on the same table.  Only the
    REPLAY path (committed output found, select never ran) re-derives
    keys from the committed documents, where a recompute is the
    protocol's correctness requirement."""
    batch_keys: dict[str, DataFrame] = {}

    def select_batch(spark, batch_df, ledger_path, text_col, exclude_batch):
        docs, keys = near_dedup_batch_against_ledger(
            spark, batch_df, ledger_path, text_col, id_col, exclude_batch,
            return_keys=True,
        )
        if keys is not None:
            batch_keys["k"] = keys
        return docs

    def keys_of(docs_df, text_col):
        keys = batch_keys.pop("k", None)
        if keys is None:
            # replay (or first-ever batch): derive from the documents
            return near_keys_of(docs_df, text_col, id_col)
        return (
            keys.join(
                docs_df.select(id_col), on=id_col, how="left_semi"
            )
            .select(FINGERPRINT_COL)
            .distinct()
        )

    return start_ledger_dedup(
        spark,
        docs_stream,
        ledger_path=ledger_path,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        text_col=text_col,
        trigger_available_now=trigger_available_now,
        trigger_processing_time=trigger_processing_time,
        on_batch_committed=on_batch_committed,
        select_batch=select_batch,
        keys_of=keys_of,
    )


def near_ledger_backfill(
    spark: SparkSession,
    corpus_df: DataFrame,
    ledger_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Bootstrap a NEAR-DUP band ledger from an existing (already
    deduplicated) corpus, so a streaming continuation drops documents
    similar to the historical corpus from its very first micro-batch.
    Writes the distinct band keys to a FRESH negative batch partition
    — ``min(existing negative ids) - 1``, the same allocation rule as
    :func:`compact_ledger` — never to a fixed id: ``batch=-1`` is the
    first compaction target, and overwriting it would silently destroy
    a compacted ledger's entire key set.  Negative ids sit below any
    streaming batch, so replay self-exclusion works unchanged.
    Returns the number of distinct keys written.

    Keys come from :func:`near_band_keys_table` — the ONLY correct
    source (the batch LSH pipeline's own defaults differ in shingle
    size, banding and key encoding)."""
    fs = _fs(spark, ledger_path)
    neg = []
    if fs.exists(ledger_path):
        neg = [
            int(d.split("=", 1)[1])
            for d in fs.listdir(ledger_path)
            if d.startswith("batch=-") and d.split("=", 1)[1].lstrip("-").isdigit()
        ]
    k = (min(neg) - 1) if neg else -1
    keys = near_keys_of(corpus_df, text_col, id_col)
    out = f"{ledger_path}/batch={k}"
    keys.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()
