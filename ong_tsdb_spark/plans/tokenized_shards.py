"""Pre-tokenized fixed-length training shards: the loader-handoff
format at the end of the data pipeline.

``plans/shards.py`` writes the corpus as token-balanced parquet shards
of raw TEXT in packing order; this module completes the handoff by
materializing the token IDS themselves — one row per fixed-length
training sequence, ids packed into a little-endian binary blob a
loader can ``np.frombuffer`` straight into a batch, no tokenizer on
the training side at all.

Tokenizer: by default the repo's BPE-proxy pretokenizer
(``text.BPE_TOKEN_RE``) with a frequency-ranked top-``vocab_size``
vocabulary — deterministic (ties broken by token string), no RNG.
Reserved ids: ``PAD_ID = 0``, ``UNK_ID = 1``; real tokens start at 2.
A LEARNED BPE merge table (``plans/bpe.train_bpe_merges``) slots in
via ``write_tokenized_shards(merges=...)``: tokenization switches to
the trained subword tokenizer and the table is recorded in the
tokenizer meta, so appends — including the streaming pipeline's —
resume byte-identically.  Everything downstream (packing, padding,
binary layout) is tokenizer-agnostic.

Scale shape:

* vocabulary: one token-count aggregate (map-side combine), top-V by
  (tf desc, token) — V is a config bound (30-100k for real BPE), so
  ranking is a V-row window and the id map BROADCASTS to executors as
  a plain dict;
* id mapping: ONE Arrow ``mapInPandas`` pass over (doc_id, tokens) —
  tokens are extracted JVM-side by the same regex that counted them
  (so layout token counts and materialized ids always agree), the
  dict lookup is the only Python step, and nothing shuffles;
* packing: each document is sliced into the training sequences it
  spans (``posexplode`` of the spanned-bin range — rows grow by the
  average span, ~1), then ONE shuffle on ``seq_id`` assembles
  sequences;
* write: ``repartition(shard_id)`` + ``partitionBy`` — one job, shards
  are token-balanced because ``shard_id = seq_id div bins_per_shard``
  and every sequence is exactly ``seq_len`` tokens.

The whole layout is integer-exact, so the registry query
``corpus_pack_sequences`` value-checks sequence membership and content
(a positional checksum of the ids) against a DuckDB twin.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ong_tsdb_spark.operators.text import BPE_TOKEN_RE

PAD_ID = 0
UNK_ID = 1
FIRST_ID = 2  # lowest id assigned to a real vocabulary token


def bpe_tokens(text: F.Column) -> F.Column:
    """All pretokenizer matches, in order (the array whose size is
    ``text.bpe_token_count``)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))


def _merges_tokens_fn(merges):
    """Tokenizer expression for a learned BPE merge table
    (plans/bpe.tokenize_expr) in the shape vocab_table/doc_token_ids
    accept — the bridge that lets the shard pipeline run on a trained
    subword tokenizer instead of the regex pretokenizer."""
    from .bpe import tokenize_expr

    table = [(str(a), str(b)) for a, b in merges]
    return lambda text: tokenize_expr(text, table)


def vocab_table(
    df: DataFrame,
    vocab_size: int = 65_000,
    text_col: str = "text",
    tokens_fn=None,
) -> DataFrame:
    """(token, id) for the top-``vocab_size`` tokens by corpus term
    frequency, ties broken by token string — fully deterministic, ids
    are dense ``FIRST_ID .. FIRST_ID + V - 1``.

    The ranking window is a single partition over at most
    ``vocab_size`` rows (the corpus-sized work — counting — is a
    map-side-combined aggregate before the LIMIT), which is exactly
    the "vocab fits one machine" assumption every tokenizer already
    makes."""
    tok = tokens_fn or bpe_tokens
    tf = (
        df.select(F.explode(tok(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(int(vocab_size))
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("token"))
    return tf.select(
        "token",
        (F.row_number().over(w) + F.lit(FIRST_ID - 1)).cast("int").alias("id"),
    )


def doc_token_ids(
    df: DataFrame,
    vocab: DataFrame | dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_fn=None,
) -> DataFrame:
    """(doc_id, ids array<int>): every document's token-id sequence.

    Tokens are extracted JVM-side (same regex as the packing layout's
    token counts); the vocabulary — bounded by ``vocab_size``, given
    as the :func:`vocab_table` DataFrame or a plain token->id dict —
    is broadcast as a Python dict, so the id mapping is one Arrow
    pass with zero shuffle and no regex-dialect drift between the
    counting and materializing paths."""
    from ong_tsdb_spark.operators.dedup import ensure_parallelism

    vmap = (
        dict(vocab)
        if isinstance(vocab, dict)
        else {r["token"]: int(r["id"]) for r in vocab.collect()}
    )
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(vmap)

    tok = tokens_fn or bpe_tokens
    tdf = ensure_parallelism(df).select(
        F.col(id_col), tok(F.col(text_col)).alias("__toks")
    )

    def mapper(batches):
        import pandas as pd

        vm = bc.value
        for pdf in batches:
            ids = [
                [] if toks is None else [vm.get(t, UNK_ID) for t in toks]
                for toks in pdf["__toks"]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "ids": ids})

    return tdf.mapInPandas(mapper, f"{id_col} long, ids array<int>")


def pack_sequences(
    df: DataFrame,
    vocab_size: int = 65_000,
    seq_len: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | dict[str, int] | None = None,
    base_tokens: int = 0,
    seed_prefix: tuple[int, list[int], int] | None = None,
    tokens_fn=None,
) -> DataFrame:
    """Materialize the concat-and-split layout: one row per training
    sequence — ``(seq_id, ids array<int> [padded to seq_len],
    n_real_tokens, n_docs)``.  Only the LAST sequence of the corpus
    can have ``n_real_tokens < seq_len``; every sequence is padded to
    exactly ``seq_len`` with ``PAD_ID``.

    Declarative end to end, and JOIN-FREE: the packing layout runs
    directly over the token-id table (``n_tok = size(ids)`` — the
    mapper emits one id per pretokenizer match, so the counts are the
    same by construction), then per-(doc, spanned-bin) ``slice`` +
    one groupBy on ``seq_id`` whose ``array_sort`` over (doc_id,
    slice) structs restores concat order.  At scale the only
    corpus-sized movements are the prefix-sum chunk shuffle and the
    seq_id assembly — no layout⋈content join at all.

    Incremental mode (used by :func:`append_tokenized_shards`):
    ``vocab`` pins a previously-trained vocabulary (ids must stay
    stable across batches), ``base_tokens`` continues the stream at
    an already-packed offset, and ``seed_prefix`` = (bin_id, ids,
    n_docs) re-seeds the partially-filled boundary sequence so its
    rewrite is byte-identical to a one-shot run over the
    concatenated corpus."""
    from ong_tsdb_spark.operators.dedup import materialize_for_self_join
    from ong_tsdb_spark.operators.text import pack_layout_over

    L = int(seq_len)
    if vocab is None:
        vocab = vocab_table(
            df, vocab_size=vocab_size, text_col=text_col, tokens_fn=tokens_fn
        )
    # materialize the id table ONCE: the chunked prefix sum consumes
    # its input twice (within-chunk window + chunk totals), and
    # Catalyst gives two consumers no ReusedExchange — without this
    # the Arrow tokenize/id-map pass runs twice (measured 2.84 s vs
    # 1.61 s at sf0.1).  Same pattern and storage contract as the
    # dedup pair-generator indexes.
    ids = materialize_for_self_join(
        doc_token_ids(df, vocab, text_col=text_col, id_col=id_col,
                      tokens_fn=tokens_fn)
    )
    j = pack_layout_over(
        ids,
        id_col,
        L,
        base_tokens=base_tokens,
        n_tok=F.size("ids"),
    )

    b = j.select(
        F.col(id_col),
        F.col("ids"),
        F.col("n_tok"),
        F.col("bin_id"),
        F.col("bin_offset"),
        F.explode(
            F.sequence(F.col("bin_id"), F.col("bin_id") + F.col("n_bins_spanned") - 1)
        ).alias("seq_id"),
    )
    # slice of THIS doc's ids that lands in bin seq_id (1-based start)
    start = F.when(F.col("seq_id") == F.col("bin_id"), F.lit(1)).otherwise(
        (F.col("seq_id") - F.col("bin_id")) * L - F.col("bin_offset") + 1
    )
    end = F.least(
        F.col("n_tok"), (F.col("seq_id") - F.col("bin_id") + 1) * L - F.col("bin_offset")
    )
    sliced = b.select(
        F.col("seq_id"),
        F.col(id_col),
        F.slice(
            F.col("ids"), start.cast("int"), F.greatest(end - start + 1, F.lit(0)).cast("int")
        ).alias("part"),
        F.lit(1).cast("long").alias("__docs"),
    )
    if seed_prefix is not None:
        # the boundary sequence's already-stored content re-enters as a
        # pseudo-slice that sorts before every real doc (id -1) and
        # carries the stored doc count as its weight
        pb, pids, pdocs = seed_prefix
        seed_row = df.sparkSession.createDataFrame(
            [(int(pb), -1, [int(x) for x in pids], int(pdocs))],
            f"seq_id long, {id_col} long, part array<int>, __docs long",
        )
        sliced = seed_row.unionByName(sliced)
    seqs = sliced.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("d"), F.col("part").alias("p")))),
                lambda s: s["p"],
            )
        ).alias("real"),
        F.sum("__docs").cast("bigint").alias("n_docs"),
    )
    return seqs.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.concat(
            F.col("real"),
            F.array_repeat(F.lit(PAD_ID).cast("int"), (F.lit(L) - F.size("real")).cast("int")),
        ).alias("ids"),
        F.size("real").cast("bigint").alias("n_real_tokens"),
        F.col("n_docs"),
    )


def ids_checksum_expr(ids: F.Column, n_real: F.Column) -> F.Column:
    """Positional checksum of the UNPADDED prefix: sum of
    (position+1) * id over the first ``n_real`` ids — integer-exact
    (bounded by seq_len^2 * vocab_size << 2^63), order-sensitive, so
    it pins both membership and concat order cross-engine."""
    real = F.slice(ids, F.lit(1), n_real.cast("int"))
    acc0 = F.struct(
        F.lit(0).cast("long").alias("p"), F.lit(0).cast("long").alias("s")
    )
    return F.aggregate(
        real,
        acc0,
        lambda acc, x: F.struct(
            (acc["p"] + 1).alias("p"),
            (acc["s"] + (acc["p"] + 1) * x.cast("long")).alias("s"),
        ),
        lambda acc: acc["s"],
    )


def pack_sequence_stats(
    df: DataFrame,
    vocab_size: int = 65_000,
    seq_len: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Value-checkable view of :func:`pack_sequences`: (seq_id,
    n_real_tokens, n_docs, ids_checksum) — the registry/oracle surface
    (arrays stay out of the cross-engine hash)."""
    seqs = pack_sequences(df, vocab_size, seq_len, text_col, id_col)
    return seqs.select(
        "seq_id",
        "n_real_tokens",
        "n_docs",
        ids_checksum_expr(F.col("ids"), F.col("n_real_tokens"))
        .cast("bigint")
        .alias("ids_checksum"),
    )


#: source-index stride inside the epoch packing key: epoch_key =
#: keep_rank * STRIDE + source_index, so the key's total order IS the
#: canonical round-robin epoch order (keep_rank asc, source asc).
#: Collision-free while source_index < STRIDE, i.e. for UP TO 1024
#: distinct sources (index 1024 would alias the next rank's index 0)
#: — real pretraining recipes have tens.  Enforced at RUNTIME by
#: epoch_pack_stats (raises ValueError when the distinct-source count
#: EXCEEDS the stride) and asserted by the integration test.
EPOCH_KEY_STRIDE = 1024


def epoch_pack_stats(
    df: DataFrame,
    target_ppm: dict[str, int] | None = None,
    vocab_size: int = 256,
    seq_len: int = 512,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The "training epoch on disk" loop END TO END: epoch-mix
    materialization (text.epoch_mix_sample picks exactly n_keep docs
    per source by deterministic hash rank) -> canonical interleaved
    epoch ORDER -> concat-and-split packing into fixed-length
    sequences (pack_sequence_stats), value-checkable cross-engine via
    the order-sensitive positional ids checksum.

    The epoch order is the round-robin the epoch_mix docstring
    promises consumers: rank 1 of every source (sources alphabetical),
    then rank 2, ...  It is encoded as ONE bigint packing key —
    ``keep_rank * EPOCH_KEY_STRIDE + source_index`` — because the
    chunked-prefix-sum packing layout chunks on ``floor(key / N)``,
    so the key must be numeric and its numeric order must equal the
    epoch order (collision-free: within a rank each source appears
    once; across ranks the stride separates).  ``source_index`` is a
    row_number over the |sources|-row distinct-source table (bounded
    unpartitioned window, same class as the vocab ranking above).

    Wire cost on top of the two pieces: one doc_id equi-join to fetch
    the kept documents' text (kept set is a large fraction of the
    corpus — not broadcastable — so this is a plain shuffled join on
    the unique key) and the |sources|-row broadcast.  Everything else
    is epoch_mix_sample's bucketed rank + pack_sequences' chunked
    prefix sum, unchanged.

    NULL-SOURCE CONTRACT: inherits ``epoch_mix_sample``'s rule — a
    NULL-source document is excluded from the epoch (it belongs to no
    mixture component), so it never reaches the packing key or the
    text join.  Pinned by ``tests/test_edge_corpus.py``."""
    from ong_tsdb_spark.operators.dedup import materialize_for_self_join
    from ong_tsdb_spark.operators.text import epoch_mix_sample

    # materialize the kept set ONCE: it feeds three consumers (the
    # stride-guard count, the broadcast source index, and the join's
    # probe side) and Catalyst gives them no common subplan — without
    # this the bucketed-rank mix re-runs per consumer.  3 slim columns
    # (source, doc_id, keep_rank), a corpus fraction — same storage
    # contract as the dedup pair-generator indexes.
    kept = materialize_for_self_join(
        epoch_mix_sample(df, target_ppm, source_col=source_col, id_col=id_col)
    )
    srcs = kept.select(source_col).distinct()
    # runtime guard (not just a test assertion): with > STRIDE sources
    # (source_index would reach the stride and alias the next rank's
    # index 0) the packed epoch keys collide and the epoch order is
    # silently corrupted.  Exactly STRIDE sources is fine: indexes span
    # 0..STRIDE-1.  Counting the checkpointed kept table is one cheap
    # bounded job; the mix itself has already run — the guard protects
    # the PACKING key construction downstream, and the failure path
    # deliberately pays the mix, not the (much larger) pack.
    n_sources = srcs.count()
    if n_sources > EPOCH_KEY_STRIDE:
        raise ValueError(
            f"epoch_pack_stats supports at most {EPOCH_KEY_STRIDE} distinct "
            f"sources (EPOCH_KEY_STRIDE={EPOCH_KEY_STRIDE}); got {n_sources} — "
            "epoch keys would collide and corrupt the epoch order"
        )
    idx = srcs.withColumn(
        "__sidx",
        (F.row_number().over(Window.orderBy(source_col)) - 1).cast("bigint"),
    )
    epoch_docs = (
        kept.join(F.broadcast(idx), on=source_col)
        .select(
            (F.col("keep_rank") * F.lit(EPOCH_KEY_STRIDE) + F.col("__sidx"))
            .cast("bigint")
            .alias("epoch_key"),
            F.col(id_col),
        )
        .join(df.select(id_col, text_col), on=id_col)
        .select("epoch_key", text_col)
    )
    return pack_sequence_stats(
        epoch_docs,
        vocab_size=vocab_size,
        seq_len=seq_len,
        text_col=text_col,
        id_col="epoch_key",
    )


def shuffled_shard_layout(
    seqs: DataFrame,
    id_col: str = "seq_id",
    bins_per_shard: int = 64,
    n_buckets: int = 1024,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic EPOCH SHUFFLE of training sequences — the last
    step of the epoch-on-disk loop: training wants sequences in
    pseudo-random order, not packing order, but a
    ``row_number() over (order by hash)`` is a single-task global sort
    at 12B sequences (100 TB / 4k-token rows).  Same cure as
    epoch_mix_sample's rank: hash-range buckets make the global hash
    order factor exactly into (bucket, within-bucket) order, so
    ``shuffle_rank = bucket_offset + local_rank`` is bit-identical to
    the global rank with the widest task at 1/n_buckets of the table.

    Adds (shuffle_rank, shard_id) to the input: ``shuffle_rank`` is
    the 1-based position in md5(salt|id) order (ties by id),
    ``shard_id = (shuffle_rank - 1) div bins_per_shard`` — shards stay
    size-balanced AND each holds a uniform random sample of the
    epoch, so sequential shard reads ARE shuffled reads.  Re-salting
    gives an independent permutation per epoch.

    Wire cost: one bucket-count aggregate over the seq table (the
    |n_buckets|-row offsets table broadcasts back) + one
    bucket-keyed exchange for the rank windows.  The offsets prefix
    sum is an unpartitioned window over the n_buckets-row aggregate —
    bounded, same class as the vocab ranking."""
    if n_buckets & (n_buckets - 1) or not 0 < n_buckets <= (1 << 60):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 60 - (n_buckets.bit_length() - 1)
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    base = seqs.withColumn("__h", h).withColumn(
        "__b",
        F.shiftright(
            F.conv(F.substring(F.col("__h"), 1, 15), 16, 10).cast("bigint"),
            shift,
        ),
    )
    offw = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("__b")
        .agg(F.count("*").cast("bigint").alias("__n"))
        .withColumn(
            "__off", F.coalesce(F.sum("__n").over(offw), F.lit(0)).cast("bigint")
        )
        .select("__b", "__off")
    )
    w = Window.partitionBy("__b").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return (
        base.join(F.broadcast(offsets), on="__b")
        .withColumn(
            "shuffle_rank",
            (F.col("__off") + F.row_number().over(w)).cast("bigint"),
        )
        .withColumn(
            "shard_id",
            F.expr(f"(shuffle_rank - 1) div {int(bins_per_shard)}").cast("bigint"),
        )
        .drop("__h", "__b", "__off")
    )


def _blob_writer(seqs: DataFrame, dtype: str, bins_per_shard: int):
    """(seq_id, ids binary, n_real_tokens, n_docs, shard_id) blobs."""
    import numpy as np

    with_shard = seqs.withColumn(
        "shard_id", F.expr(f"seq_id div {int(bins_per_shard)}").cast("bigint")
    )

    def to_blob(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "seq_id": pdf["seq_id"],
                    "ids": [
                        np.asarray(a, dtype=dtype).tobytes() for a in pdf["ids"]
                    ],
                    "n_real_tokens": pdf["n_real_tokens"],
                    "n_docs": pdf["n_docs"],
                    "shard_id": pdf["shard_id"],
                }
            )

    return with_shard.mapInPandas(
        to_blob,
        "seq_id long, ids binary, n_real_tokens long, n_docs long, shard_id long",
    )


def _write_meta(out_dir: str, meta: dict) -> None:
    tmp = os.path.join(out_dir, "_tokenizer_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "_tokenizer_meta.json"))


def _write_vocab(out_dir: str, vocab: DataFrame | dict[str, int]) -> dict[str, int]:
    """Persist the vocabulary as an id-ordered token list (ids are
    dense from FIRST_ID, so the list index IS the id); atomic."""
    vmap = (
        dict(vocab)
        if isinstance(vocab, dict)
        else {r["token"]: int(r["id"]) for r in vocab.collect()}
    )
    ids = sorted(vmap.values())
    if ids != list(range(FIRST_ID, FIRST_ID + len(ids))):
        raise ValueError(
            "vocabulary ids must be dense from FIRST_ID "
            f"({FIRST_ID}..{FIRST_ID + len(ids) - 1}) to persist as an "
            "id-ordered token list"
        )
    ordered = [t for t, _ in sorted(vmap.items(), key=lambda kv: kv[1])]
    tmp = os.path.join(out_dir, "_vocab.json.tmp")
    with open(tmp, "w") as f:
        json.dump(ordered, f)
    os.replace(tmp, os.path.join(out_dir, "_vocab.json"))
    return vmap


def read_vocab(out_dir: str) -> dict[str, int]:
    with open(os.path.join(out_dir, "_vocab.json")) as f:
        return {t: FIRST_ID + i for i, t in enumerate(json.load(f))}


def write_tokenized_shards(
    df: DataFrame,
    out_dir: str,
    vocab_size: int = 65_000,
    seq_len: int = 4096,
    bins_per_shard: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | dict[str, int] | None = None,
    merges: list[tuple[str, str]] | None = None,
) -> int:
    """Write pre-tokenized fixed-length shards:
    ``out_dir/shard_id=N/`` parquet whose rows are
    ``(seq_id, ids binary, n_real_tokens, n_docs)`` in ascending
    ``seq_id`` order, plus sidecars ``_tokenizer_meta.json`` (dtype,
    seq_len, reserved ids, total_tokens) and ``_vocab.json`` (the
    id-ordered token list) that make the directory self-describing
    for both the loader (``np.frombuffer``) and incremental appends
    (:func:`append_tokenized_shards`).  Returns the number of shards.

    ``uint16`` when the id space fits (max id < 65536), else
    ``int32`` — at 4096 tokens that is 8 KiB vs 16 KiB per training
    sequence.  ``vocab`` pins a pre-trained vocabulary instead of
    training top-``vocab_size`` on this corpus; the blob dtype and the
    recorded vocab size always follow the ACTUAL vocabulary, so a
    supplied vocab larger than the default cannot silently overflow
    uint16.

    ``merges`` switches tokenization from the regex pretokenizer to a
    LEARNED BPE merge table (plans/bpe.train_bpe_merges output): the
    vocabulary is trained over the resulting subword stream (or pin
    one with ``vocab``), and the table is RECORDED in
    ``_tokenizer_meta.json`` so appends — including the streaming
    pipeline's — resume with byte-identical tokenization; directories
    written without merges carry no key and keep the default
    pretokenizer forever.

    Paths are local-filesystem (or any mounted store): the sidecar
    and marker files use plain ``open``/``os.replace``, unlike the
    parquet writes — route ``out_dir`` through a mount (fuse-s3 etc.)
    for object stores."""
    tokens_fn = _merges_tokens_fn(merges) if merges else None
    max_doc = df.agg(F.max(F.col(id_col)).alias("m")).first()["m"]
    if max_doc is None and vocab is None:
        raise ValueError(
            "cannot train a vocabulary on an empty corpus — pass a "
            "pre-trained vocab= to bootstrap an empty shard directory "
            "(an empty trained vocab would map every later-appended "
            "token to UNK forever)"
        )
    vmap, dtype = _resolve_vocab_dtype(
        df, vocab, vocab_size, text_col, tokens_fn
    )
    if max_doc is None:
        # empty corpus: a valid, appendable-to directory with no rows —
        # with the same overwrite semantics as the non-empty path
        # (pre-existing shard data is cleared, not silently orphaned
        # under zeroed meta)
        return _write_empty_dir(
            out_dir, vmap, dtype, seq_len, bins_per_shard, merges
        )
    seqs = pack_sequences(
        df, vocab_size, seq_len, text_col, id_col, vocab=vmap,
        tokens_fn=tokens_fn,
    )
    return _commit_packed_shards(
        seqs, out_dir, vmap, dtype, seq_len, bins_per_shard,
        last_doc_id=int(max_doc), merges=merges,
    )


def _resolve_vocab_dtype(
    df: DataFrame,
    vocab: DataFrame | dict[str, int] | None,
    vocab_size: int,
    text_col: str,
    tokens_fn,
) -> tuple[dict[str, int], str]:
    """Shared writer head: train-or-accept the vocabulary and derive
    the blob dtype from the REAL id space (ids dense from FIRST_ID) —
    '<u2' iff the max id fits uint16, else '<i4'.  ONE home for the
    dtype law so the writers can never diverge."""
    if vocab is None:
        vocab = vocab_table(
            df, vocab_size=vocab_size, text_col=text_col, tokens_fn=tokens_fn
        )
    vmap = (
        dict(vocab)
        if isinstance(vocab, dict)
        else {r["token"]: int(r["id"]) for r in vocab.collect()}
    )
    max_id = max(vmap.values(), default=FIRST_ID - 1)
    return vmap, ("<u2" if max_id < 65_536 else "<i4")


def _write_empty_dir(
    out_dir: str,
    vmap: dict[str, int],
    dtype: str,
    seq_len: int,
    bins_per_shard: int,
    merges: list[tuple[str, str]] | None = None,
    extra_meta: dict | None = None,
) -> int:
    """Empty-corpus commit: a valid, verify_shards-clean directory with
    zero rows — with the same overwrite semantics as the non-empty path
    (pre-existing shard data is cleared, not silently orphaned)."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    _write_vocab(out_dir, vmap)
    _write_meta(
        out_dir,
        {
            "dtype": dtype,
            "seq_len": int(seq_len),
            "vocab_size": len(vmap),
            "pad_id": PAD_ID,
            "unk_id": UNK_ID,
            "first_id": FIRST_ID,
            "bins_per_shard": int(bins_per_shard),
            "total_tokens": 0,
            "boundary": None,
            "last_doc_id": None,
            **({"merges": [list(m) for m in merges]} if merges else {}),
            **(extra_meta or {}),
        },
    )
    return 0


def _commit_packed_shards(
    seqs: DataFrame,
    out_dir: str,
    vmap: dict[str, int],
    dtype: str,
    seq_len: int,
    bins_per_shard: int,
    last_doc_id: int | None,
    merges: list[tuple[str, str]] | None = None,
    extra_meta: dict | None = None,
) -> int:
    """Shared commit tail of the shard writers: blob-encode, one
    shard-partitioned sorted parquet write, then the vocab/meta
    sidecars derived from ONE aggregate over the written shards."""
    blobs = _blob_writer(seqs, dtype, bins_per_shard)
    (
        blobs.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "seq_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    # sidecars AFTER the parquet job: mode("overwrite") clears out_dir
    _write_vocab(out_dir, vmap)
    spark = seqs.sparkSession
    # ONE aggregate over the written shards for every meta field
    s = spark.read.parquet(out_dir).agg(
        F.coalesce(F.sum("n_real_tokens"), F.lit(0)).alias("t"),
        F.max("seq_id").alias("mseq"),
        F.max_by("n_docs", "seq_id").alias("mdocs"),
        F.countDistinct("shard_id").alias("nsh"),
    ).first()
    _write_meta(
        out_dir,
        {
            "dtype": dtype,
            "seq_len": int(seq_len),
            "vocab_size": len(vmap),
            "pad_id": PAD_ID,
            "unk_id": UNK_ID,
            "first_id": FIRST_ID,
            "bins_per_shard": int(bins_per_shard),
            "total_tokens": int(s["t"]),
            # the last (possibly partial) sequence's identity and doc
            # count AS OF this commit — what a crash-replayed append
            # needs to re-seed correctly even if shard files were
            # already partially rewritten (see append_tokenized_shards)
            "boundary": (
                {"seq_id": int(s["mseq"]), "n_docs": int(s["mdocs"])}
                if s["mseq"] is not None
                else None
            ),
            # append batches must continue the doc_id order — enforced
            "last_doc_id": last_doc_id,
            **({"merges": [list(m) for m in merges]} if merges else {}),
            **(extra_meta or {}),
        },
    )
    return int(s["nsh"])


def write_shuffled_shards(
    df: DataFrame,
    out_dir: str,
    vocab_size: int = 65_000,
    seq_len: int = 4096,
    bins_per_shard: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | dict[str, int] | None = None,
    merges: list[tuple[str, str]] | None = None,
    salt: str = "shuffle",
    n_buckets: int = 1024,
) -> int:
    """The epoch-on-disk loop's WRITE step in SHUFFLED order: pack the
    corpus (:func:`pack_sequences`, corpus order), permute it with
    :func:`shuffled_shard_layout`'s deterministic bucketed md5 rank,
    and renumber ``seq_id := shuffle_rank - 1`` before committing — so
    the on-disk layout (ascending shards, sorted files) IS the
    shuffled training order and sequential consumption
    (:func:`iter_training_sequences`) needs no changes.  Re-salting
    writes an independent permutation of the SAME sequence set per
    epoch.  The directory passes :func:`verify_shards` (contiguous
    renumbered ids, shard-assignment law, token totals) like any other
    shard dir; the applied ``salt`` is recorded in the meta.  A
    shuffled epoch is a one-shot artifact:
    :func:`append_tokenized_shards` refuses it (``last_doc_id`` is
    absent — appending would interleave unshuffled data)."""
    tokens_fn = _merges_tokens_fn(merges) if merges else None
    shuffled_meta = {"shuffled": {"salt": salt, "n_buckets": int(n_buckets)}}
    max_doc = df.agg(F.max(F.col(id_col)).alias("m")).first()["m"]
    if max_doc is None and vocab is None:
        raise ValueError(
            "cannot train a vocabulary on an empty corpus — pass a "
            "pre-trained vocab= to write an empty shuffled directory"
        )
    vmap, dtype = _resolve_vocab_dtype(
        df, vocab, vocab_size, text_col, tokens_fn
    )
    if max_doc is None:
        # empty epoch: a valid zero-row directory (still refuses
        # appends via the recorded shuffled meta)
        return _write_empty_dir(
            out_dir, vmap, dtype, seq_len, bins_per_shard, merges,
            extra_meta=shuffled_meta,
        )
    seqs = pack_sequences(
        df, vocab_size, seq_len, text_col, id_col, vocab=vmap,
        tokens_fn=tokens_fn,
    )
    shuffled = (
        shuffled_shard_layout(
            seqs, bins_per_shard=bins_per_shard, salt=salt, n_buckets=n_buckets
        )
        .select(
            (F.col("shuffle_rank") - 1).cast("bigint").alias("seq_id"),
            "ids",
            "n_real_tokens",
            "n_docs",
        )
    )
    return _commit_packed_shards(
        shuffled, out_dir, vmap, dtype, seq_len, bins_per_shard,
        last_doc_id=None, merges=merges, extra_meta=shuffled_meta,
    )


def append_tokenized_shards(
    df_new: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Continue packing a NEW batch of documents into an existing
    shard directory — the incremental handoff for a streaming/batch
    ingest pipeline: the stream resumes exactly where the previous
    run stopped (mid-sequence included), the pinned ``_vocab.json``
    keeps ids stable, and only the boundary shard plus genuinely new
    shards are rewritten (dynamic partition overwrite — untouched
    shard directories are not even listed).

    Equivalence contract (pinned by
    ``test_append_equals_oneshot``): write(A) then append(B) produces
    byte-identical blobs to write(A ++ B) under the same vocabulary,
    provided every new ``doc_id`` sorts after the already-packed ones
    (the training order is doc_id order; an append IS the statement
    "these documents come next").  Returns the number of shards
    written/rewritten by this append."""
    import numpy as np

    spark = df_new.sparkSession
    meta = read_tokenizer_meta(out_dir)
    if meta.get("shuffled") is not None:
        raise ValueError(
            "cannot append to a SHUFFLED shard directory (written by "
            "write_shuffled_shards): its on-disk order is a permuted "
            "epoch snapshot — appending would interleave unshuffled "
            "data.  Re-run write_shuffled_shards over the full corpus "
            "(optionally with a new salt) instead."
        )
    vmap = read_vocab(out_dir)
    # a directory written with a learned merge table records it in the
    # meta — the append MUST tokenize identically or sequence content
    # silently diverges from the one-shot equivalence contract
    rec_merges = meta.get("merges")
    tokens_fn = _merges_tokens_fn(rec_merges) if rec_merges else None
    L = int(meta["seq_len"])
    base = int(meta["total_tokens"])
    dtype = meta["dtype"]
    bps = int(meta["bins_per_shard"])
    last_bin, rem = divmod(base, L)

    # one up-front scan of the batch: id extremes only — NO
    # tokenization here (the pack pipeline tokenizes once; the token
    # total is recovered from the written sequences below)
    stats = df_new.agg(
        F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
    ).first()
    if stats["lo"] is None:
        return 0  # empty batch: nothing to pack, nothing to rewrite
    last_doc = meta.get("last_doc_id")
    if last_doc is not None and int(stats["hi"]) <= int(last_doc):
        # an at-least-once caller replaying a batch whose append
        # already committed its meta: every id is <= the recorded
        # last, so the batch is treated as already packed — an
        # idempotent no-op, NOT an error (raising here would wedge a
        # restarted stream forever on the same batch).  NOTE a batch
        # that is NOT a replay but happens to carry only ids <= the
        # recorded last is an ordering-contract violation either way
        # (those positions in the training stream have already been
        # written); warn loudly so a misordered producer is visible.
        import warnings

        warnings.warn(
            f"append batch ids [{stats['lo']}, {stats['hi']}] are all <= "
            f"the recorded last_doc_id={last_doc}; treating as an "
            "at-least-once replay (no-op).  If this batch was NOT a "
            "replay, its documents violate the doc_id ordering "
            "contract and are NOT packed.",
            stacklevel=2,
        )
        return 0
    if last_doc is not None and int(stats["lo"]) <= int(last_doc):
        raise ValueError(
            f"append batch doc_id {stats['lo']} does not sort after the "
            f"already-packed corpus (last_doc_id={last_doc}); the "
            "training order is doc_id order, so appended batches "
            "must carry strictly increasing ids"
        )

    # the boundary sequence (and any zero-token stragglers parked at
    # the exact boundary) re-seeds the first rewritten bin.  The doc
    # count comes from the META (committed atomically with
    # total_tokens), NOT the stored row: a crash-replayed append may
    # find the boundary shard already partially rewritten, where the
    # stored n_docs would double-count — but the stored blob's first
    # ``rem`` ids are still the correct prefix either way, because an
    # append only ever EXTENDS that sequence
    seed = None
    bmeta = meta.get("boundary")
    if bmeta is not None and int(bmeta["seq_id"]) == last_bin:
        stored = (
            spark.read.parquet(out_dir)
            # shard_id filter first: partition-pruned to ONE directory
            .filter(
                (F.col("shard_id") == last_bin // bps)
                & (F.col("seq_id") == last_bin)
            )
            .select("ids")
            .collect()
        )
        prefix = (
            list(np.frombuffer(stored[0]["ids"], dtype=dtype)[:rem]) if stored else []
        )
        seed = (last_bin, [int(x) for x in prefix], int(bmeta["n_docs"]))

    seqs = pack_sequences(
        df_new,
        seq_len=L,
        text_col=text_col,
        id_col=id_col,
        vocab=vmap,
        base_tokens=base,
        seed_prefix=seed,
        tokens_fn=tokens_fn,
    )
    blobs = _blob_writer(seqs, dtype, bps)
    # dynamic overwrite replaces whole shard DIRECTORIES, so the
    # boundary shard's already-final sequences (seq_id < last_bin in
    # the same shard) must ride along or they would be dropped.
    # localCheckpoint materializes them first — both to cut the
    # read-from-the-path-being-overwritten dependency and to bound the
    # cost: at most bins_per_shard rows of one shard.  A directory
    # with no rows yet (empty initial write) has nothing to keep —
    # and no parquet files to infer a schema from.
    if meta.get("boundary") is not None:
        keep = (
            spark.read.parquet(out_dir)
            .filter(
                (F.col("shard_id") == last_bin // bps)
                & (F.col("seq_id") < last_bin)
            )
            .select("seq_id", "ids", "n_real_tokens", "n_docs", "shard_id")
            .localCheckpoint(eager=True)
        )
        blobs = keep.unionByName(blobs)
    (
        blobs
        .repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "seq_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    # one partition-pruned aggregate over the rewritten range recovers
    # every meta field: tokens in bins >= last_bin (the rem-token
    # prefix rides the boundary bin, so total = tokens-before-boundary
    # + this sum), the new boundary sequence and its doc count —
    # no re-tokenization of the batch anywhere
    nb = (
        spark.read.parquet(out_dir)
        .filter(
            (F.col("shard_id") >= last_bin // bps)
            & (F.col("seq_id") >= last_bin)
        )
        .agg(
            F.coalesce(F.sum("n_real_tokens"), F.lit(0)).alias("t"),
            F.max("seq_id").alias("mseq"),
            F.max_by("n_docs", "seq_id").alias("mdocs"),
        )
        .first()
    )
    meta["total_tokens"] = (base - rem) + int(nb["t"])
    meta["last_doc_id"] = int(stats["hi"])
    if nb["mseq"] is not None:
        meta["boundary"] = {"seq_id": int(nb["mseq"]), "n_docs": int(nb["mdocs"])}
    _write_meta(out_dir, meta)
    # packing is contiguous, so the rewritten shard range is exactly
    # [boundary shard before, boundary shard after] — no recompute of
    # the blob pipeline just to count it
    return int(nb["mseq"]) // bps - last_bin // bps + 1 if nb["mseq"] is not None else 0


def read_tokenizer_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "_tokenizer_meta.json")) as f:
        return json.load(f)


def verify_shards(spark, out_dir: str) -> dict:
    """X1-style integrity check for a tokenized shard directory — the
    maintenance counterpart of ``plans.maintenance.verify_sensor`` for
    the training-shard format.  ONE aggregate over the shards proves:

    * sequence ids are contiguous ``0..max`` (count == max+1 — a hole
      means a lost shard rewrite),
    * every blob is exactly ``seq_len * itemsize`` bytes,
    * real-token counts are within ``[0, seq_len]`` and their sum
      equals the meta's committed ``total_tokens``,
    * every row sits in its ``seq_id div bins_per_shard`` shard.

    Returns the stats dict with an ``ok`` flag; raises nothing — a
    missing directory/meta reports ``ok=False`` with an ``error``
    field, an empty directory reports ``n_sequences = 0`` and is ok
    iff the meta also says zero tokens, and a directory whose meta
    claims content but whose shard files are gone (the lost-rewrite
    case) reports ``ok=False`` instead of crashing."""
    import numpy as np

    try:
        meta = read_tokenizer_meta(out_dir)
    except (FileNotFoundError, ValueError) as e:
        return {"n_sequences": 0, "ok": False, "error": f"meta unreadable: {e}"}
    L = int(meta["seq_len"])
    bps = int(meta["bins_per_shard"])
    blob_len = L * np.dtype(meta["dtype"]).itemsize
    if meta.get("boundary") is None:
        return {
            "n_sequences": 0,
            "ok": int(meta["total_tokens"]) == 0,
            "total_tokens": int(meta["total_tokens"]),
        }
    try:
        read = spark.read.parquet(out_dir)
    except Exception as e:  # AnalysisException: shard data lost entirely
        return {
            "n_sequences": 0,
            "ok": False,
            "meta_total_tokens": int(meta["total_tokens"]),
            "error": f"meta claims content but shard data is unreadable: {e}"[:300],
        }
    s = (
        read
        .agg(
            F.count("*").alias("n"),
            F.max("seq_id").alias("mseq"),
            F.countDistinct("seq_id").alias("nseq"),
            F.coalesce(F.sum("n_real_tokens"), F.lit(0)).alias("tok"),
            F.sum((F.length("ids") != blob_len).cast("long")).alias("bad_blob"),
            F.sum(
                (
                    (F.col("n_real_tokens") < 0) | (F.col("n_real_tokens") > L)
                ).cast("long")
            ).alias("bad_real"),
            F.sum(
                (F.col("shard_id") != F.expr(f"seq_id div {bps}")).cast("long")
            ).alias("bad_shard"),
        )
        .first()
    )
    if s["mseq"] is None:  # zero-row files under a content-claiming meta
        return {
            "n_sequences": 0,
            "ok": False,
            "meta_total_tokens": int(meta["total_tokens"]),
            "error": "meta claims content but shard files hold zero rows",
        }
    out = {
        "n_sequences": int(s["n"]),
        "max_seq_id": int(s["mseq"]),
        "total_tokens": int(s["tok"]),
        "duplicate_seq": int(s["n"]) - int(s["nseq"]),
        "holes": int(s["mseq"]) + 1 - int(s["nseq"]),
        "bad_blob_len": int(s["bad_blob"]),
        "bad_real_count": int(s["bad_real"]),
        "bad_shard_assign": int(s["bad_shard"]),
        "meta_total_tokens": int(meta["total_tokens"]),
    }
    out["ok"] = (
        out["duplicate_seq"] == 0
        and out["holes"] == 0
        and out["bad_blob_len"] == 0
        and out["bad_real_count"] == 0
        and out["bad_shard_assign"] == 0
        and out["total_tokens"] == out["meta_total_tokens"]
    )
    return out


def iter_training_sequences(out_dir: str):
    """LOADER-side consumption — no Spark: yield ``(seq_id, ids
    np.ndarray[seq_len], n_real_tokens)`` in exact training order by
    scanning shard directories ascending and each file's rows in
    written order (the writer sorts within partitions, so file order
    IS training order).  This is the complete handoff: a training
    process needs only pyarrow + numpy and this function.

    Concurrency: reads a SNAPSHOT of whatever files exist — do not
    iterate while an append is rewriting the boundary shard (the
    loader normally consumes a directory the ingest side has finished
    with; for live tailing, stop at ``meta['boundary']['seq_id'] - 1``
    of a meta read BEFORE the scan, which is always fully
    committed)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    meta = read_tokenizer_meta(out_dir)
    dtype = np.dtype(meta["dtype"])
    shard_dirs = sorted(
        glob.glob(os.path.join(out_dir, "shard_id=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    for d in shard_dirs:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            t = pq.read_table(f, columns=["seq_id", "ids", "n_real_tokens"])
            for sid, blob, nr in zip(
                t["seq_id"].to_pylist(),
                t["ids"].to_pylist(),
                t["n_real_tokens"].to_pylist(),
            ):
                yield sid, np.frombuffer(blob, dtype=dtype), nr
