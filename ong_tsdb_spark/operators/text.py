"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, document fingerprinting.

All pure Catalyst column expressions (split/filter/transform/md5 —
JVM-side, whole-stage codegen); no Python UDFs, so throughput is
bounded by the Parquet scan, not the Python interpreter.  Each has an
exact ANSI-SQL twin in the DuckDB oracle (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny language-marker lexicons for the n-gram/stopword heuristic.
# Deliberately small + hardcoded: the oracle SQL embeds the same lists.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
ES_STOPWORDS = ["el", "la", "de", "y", "que", "en", "un", "una", "es", "los"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


#: GPT-2-style pretokenizer pattern, restricted to the Java-regex /
#: RE2 COMMON SUBSET (ordered alternation, \p{L}/\p{N} classes, no
#: lookarounds — the original's `\s+(?!\S)` branch is dropped).  The
#: whitespace class is spelled out because Java's \s includes \x0B
#: while RE2's does not; an explicit class makes both engines match
#: identical strings.  Both match leftmost-first, so counts agree.
_WS = r" \t\n\x0B\f\r"
BPE_TOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    rf"| ?\p{{L}}+| ?\p{{N}}+| ?[^{_WS}\p{{L}}\p{{N}}]+|[{_WS}]+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pretokenizer matches — the
    standard cheap proxy for LLM token budgets (within ~1.3x of a real
    BPE vocab on English text) without shipping a merges table."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


#: Rabin-Karp window-hash parameters.  M = 2^31 - 1 keeps every
#: intermediate (acc*B + w, acc < M, B ~ 1e6, w < M) under 2^52 —
#: exact in BIGINT arithmetic in any engine.
ROLL_BASE = 1_000_003
ROLL_MOD = 2_147_483_647


def rolling_hash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """(id, hashes array<long>) — Rabin-Karp polynomial hash of every
    k-token window: h_i = fold(acc*B + w_j mod M) over window i, where
    w_j is the token's md5-derived 32-bit value reduced mod M.

    Tokens and word-values are materialized in SEPARATE projections
    before the window transform (the dedup._shingles_of rule: an
    expression captured in a lambda re-evaluates per element — with
    the fold inside, that would be O(n^2 * k) per doc).  Pure per-row
    lambda work, exact integer math — any engine reproduces the
    hashes bit-for-bit."""
    from .dedup import ensure_parallelism

    toks = ensure_parallelism(df).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    wv = toks.select(
        F.col(id_col),
        F.transform(
            F.col("__toks"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % F.lit(ROLL_MOD),
        ).alias("__wv"),
    )
    cnt = F.size(F.col("__wv"))
    idx = F.when(cnt >= k, F.sequence(F.lit(1), cnt - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return wv.select(
        F.col(id_col),
        F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice(F.col("__wv"), i, k),
                F.lit(0).cast("long"),
                lambda acc, w: (acc * F.lit(ROLL_BASE) + w) % F.lit(ROLL_MOD),
            ),
        ).alias("hashes"),
    )


#: boilerplate phrases whose presence drops a page under the C4 rules
#: (Raffel et al. 2020 §2.2) — the oracle SQL embeds the same list
C4_POLICY_PHRASES = [
    "lorem ipsum",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
]


def c4_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683
    §2.2) per document — the named rule-set next to
    :func:`gopher_quality`:

    * line filter: keep only lines ending in terminal punctuation
      (``. ! ? "``) with at least 5 words,
    * page keeps only if the RETAINED lines carry >= 3 sentences
      (terminal-mark count),
    * drop any page containing ``{`` (code), "lorem ipsum", or a
      policy/boilerplate phrase (case-insensitive).

    Returns (doc_id, n_lines, n_kept_lines, n_sentences, has_brace,
    has_policy, c4_pass).  Pure Catalyst line/array expressions —
    map-side, integer counts, no shuffle; the three-sentence-SPAN
    dedup that completes C4 is :func:`~..dedup.passage_dup_stats`.

    NULL text is scored as the EMPTY document (c4_pass false, counts
    of ''): a filter verdict must exist for every row — an all-NULL
    row would silently survive a ``WHERE NOT c4_pass`` drop (NULL is
    not true), the opposite of what a cleaning rule should do to a
    contentless page (code-review r9, edge-corpus replay)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")
    keep_line = lambda l: (  # noqa: E731
        F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), " ")) >= 5)
    )
    kept = F.filter(lines, keep_line)
    kept_text = F.array_join(kept, "\n")
    lower = F.lower(txt)
    has_policy = None
    for p in C4_POLICY_PHRASES:
        c = lower.contains(p)
        has_policy = c if has_policy is None else (has_policy | c)
    n_sent = F.size(F.regexp_extract_all(kept_text, F.lit("[.!?]"), F.lit(0)))
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        n_sent.cast("bigint").alias("n_sentences"),
        txt.contains("{").alias("has_brace"),
        has_policy.alias("has_policy"),
        (
            (n_sent >= 3)
            & ~txt.contains("{")
            & ~has_policy
        ).alias("c4_pass"),
    )


def dup_span_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """Duplicated-SPAN coverage per document (the metric behind exact
    substring deduplication, Lee et al. 2022, arXiv:2107.06499
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of each document's tokens covered by some k-token window
    whose Rabin-Karp hash occurs >= 2 times ANYWHERE in the corpus
    (cross-doc or within-doc).  The suffix-array pass of the paper
    re-expressed Spark-first: the fingerprint index replaces the
    suffix array — hash-equal spans stand in for byte-equal spans
    (mod-2^31-1 collisions are possible but deterministic, so both
    engines agree row-for-row).

    Returns (doc_id, n_tokens, n_windows, n_dup_windows,
    dup_cover_tokens, dup_frac) — ``dup_cover_tokens`` is the exact
    length of the UNION of the duplicated k-windows (overlaps merged
    via the sorted-gap rule: each duplicated position contributes
    min(k, next_dup_pos - pos)), so a run of overlapping duplicated
    windows counts its tokens once.

    Scale shape: one window count over the span-hash key (the only
    corpus-sized shuffle), then per-doc lead/aggregate on the id key;
    the hash table is materialized once for its two consumers (the
    dedup._shingles_of / pack-pipeline rule — Catalyst reuses nothing
    across consumers)."""
    from pyspark.sql import Window

    from .dedup import ensure_parallelism, materialize_for_self_join

    toks = ensure_parallelism(df).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    wv = toks.select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        F.transform(
            F.col("__toks"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % F.lit(ROLL_MOD),
        ).alias("__wv"),
    )
    cnt = F.size(F.col("__wv"))
    idx = F.when(cnt >= k, F.sequence(F.lit(1), cnt - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    ht = materialize_for_self_join(
        wv.select(
            F.col(id_col),
            F.col("n_tokens"),
            F.transform(
                idx,
                lambda i: F.aggregate(
                    F.slice(F.col("__wv"), i, k),
                    F.lit(0).cast("long"),
                    lambda acc, w: (acc * F.lit(ROLL_BASE) + w) % F.lit(ROLL_MOD),
                ),
            ).alias("hashes"),
        )
    )
    pos = ht.select(
        F.col(id_col), F.posexplode(F.col("hashes")).alias("pos", "h")
    )
    freq = F.count("*").over(Window.partitionBy("h"))
    dup = pos.withColumn("__c", freq).filter(F.col("__c") >= 2)
    nxt = F.lead("pos").over(Window.partitionBy(id_col).orderBy("pos"))
    per_doc = (
        dup.withColumn("__next", nxt)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_dup_windows"),
            F.sum(
                F.least(F.lit(k).cast("long"), F.coalesce(F.col("__next") - F.col("pos"), F.lit(k)).cast("long"))
            ).cast("bigint").alias("dup_cover_tokens"),
        )
    )
    return (
        ht.join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.size("hashes").cast("bigint").alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce(F.col("dup_cover_tokens"), F.lit(0)).cast("bigint").alias("dup_cover_tokens"),
            (
                F.coalesce(F.col("dup_cover_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_frac"),
        )
    )


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_hits(text: Column, words: list[str]) -> Column:
    """How many tokens are in ``words`` — set-membership via a
    Catalyst lambda (filter + array_contains), no UDF."""
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lst, t)))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: length, token stats, stopword ratio.

    mean_token_len and stopword_ratio are single double divisions of
    exact integers -> bitwise-deterministic across engines.
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_char = char_count(t)
    sw = stopword_hits(t, EN_STOPWORDS)
    return df.select(
        F.col(id_col),
        n_char.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        (
            (n_char - n_tok + F.lit(1)).cast("double") / n_tok.cast("double")
        ).alias("mean_token_len"),
        (sw.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-count language heuristic: count marker words per
    language, pick the max (ties -> 'und')."""
    t = F.col(text_col)
    en = stopword_hits(t, EN_STOPWORDS)
    es = stopword_hits(t, ES_STOPWORDS)
    lang = (
        F.when(en > es, F.lit("en")).when(es > en, F.lit("es")).otherwise(F.lit("und"))
    )
    return df.select(
        F.col(id_col), en.alias("en_hits"), es.alias("es_hits"), lang.alias("lang_pred")
    )


# PII patterns chosen for cross-engine regex parity (Java regex and
# RE2 agree on these constructs: char classes, +, {m,n}, alternation)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Mask emails, phone numbers and IPv4 addresses — the standard
    pre-training scrub pass, as chained JVM-side regexp_replace."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Boilerplate signal: 1 - distinct_ngrams/total_ngrams (0 = no
    repetition). Computed on a materialized token array (see
    dedup._shingles_of for why)."""
    # exposed as an expression for single-column use; the query path
    # materializes tokens first (operators/dedup.py pattern)
    from .dedup import word_shingles

    sh = word_shingles(text, n)
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    return F.when(
        total > 0, F.lit(1.0) - distinct.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint = md5 of the normalized
    text.  (The reference's only hashing op is md5-of-file,
    database.py:795-800 — same digest, content-addressed here.)"""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp")
    )


# Gopher-rule marker stopwords (Rae et al. 2021, MassiveWeb filter):
# a document must contain >= 2 of these to pass.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_features(t: Column) -> dict[str, Column]:
    """The Gopher rule features as named column expressions — shared
    by the batch report (:func:`gopher_quality`) and the streaming
    quality gate (:func:`gopher_pass_expr`), so the two paths cannot
    drift."""
    toks = tokens(t)
    n_tok = F.size(toks).cast("bigint")
    n_char = F.length(t)
    mean_len = (n_char - n_tok + F.lit(1)).cast("double") / n_tok.cast("double")
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    alpha_frac = alpha.cast("double") / n_tok.cast("double")
    n_hash = n_char - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = (n_char - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_tok.cast("double")
    stop_hits = stopword_hits(t, GOPHER_STOPWORDS).cast("bigint")
    return {
        "n_words": n_tok,
        "mean_word_len": mean_len,
        "alpha_frac": alpha_frac,
        "symbol_ratio": symbol_ratio,
        "stop_hits": stop_hits,
    }


def gopher_pass_expr(t: Column) -> Column:
    """The combined Gopher pass/fail verdict as one boolean column —
    usable as a streaming-safe stateless filter."""
    f = _gopher_features(t)
    return (
        f["n_words"].between(50, 100_000)
        & f["mean_word_len"].between(3.0, 10.0)
        & (f["symbol_ratio"] < 0.1)
        & (f["alpha_frac"] > 0.8)
        & (f["stop_hits"] >= 2)
    )


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length band, symbol-to-word ratio,
    alphabetic-word fraction, and required-stopword hits, plus the
    combined pass/fail verdict.

    Everything is integer counting + single double divisions (the
    cross-engine determinism rules of the registry); the '...' count
    uses length-difference-of-replace, identical left-to-right
    non-overlapping semantics in both engines.
    """
    t = F.col(text_col)
    f = _gopher_features(t)
    n_tok = f["n_words"]
    mean_len = f["mean_word_len"]
    alpha_frac = f["alpha_frac"]
    symbol_ratio = f["symbol_ratio"]
    stop_hits = f["stop_hits"]
    return df.select(
        F.col(id_col),
        n_tok.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        (
            n_tok.between(50, 100_000)
            & mean_len.between(3.0, 10.0)
            & (symbol_ratio < 0.1)
            & (alpha_frac > 0.8)
            & (stop_hits >= 2)
        ).alias("gopher_pass"),
    )


def vocab(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary: (token, tf, df_docs) — term frequency and
    document frequency per distinct token.

    Scale shape: explode happens map-side and the groupBy on the token
    partially aggregates before the shuffle (tf is a plain count;
    df_docs counts tokens' *per-doc distinct* occurrences, which is a
    map-side array_distinct per document rather than a corpus-wide
    count-distinct expansion), so the shuffle carries one row per
    distinct (mapper, token)."""
    per_doc = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
        )
    tf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = per_doc.groupBy("token").agg(F.count("*").alias("df_docs"))
    return tf.join(dfreq, on="token")


def length_band_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    group_col: str = "lang",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Length-outlier banding per group: the DISCRETE percentile band
    [p_lo, p_hi] of ``len_col`` within each ``group_col`` and how many
    documents fall inside it — the standard "drop truncated fragments
    and concatenation blobs" filter, reported per language so the band
    adapts to each language's natural document length.

    Discrete percentiles (the k-th order statistic with
    k = ceil(p * n), no interpolation) keep every value an actual
    corpus length and the whole computation integer-exact across
    engines — interpolating percentiles would hinge on engines agreeing
    about float index arithmetic.

    Scale shape: one shuffle on the group key for the rank window, one
    broadcast-sized band table (|groups| rows) joined back for the
    in-band count.  Per-group windows funnel each group through one
    task: fine for language-sized cardinality (~100s of groups); for
    higher-cardinality grouping route through the chunked prefix
    machinery instead (operators/prefix.py)."""
    # NULL lengths are EXCLUDED from the order statistics entirely
    # (ranks, counts, and the in-band tally): Spark's default ASC puts
    # NULLs first while SQL puts them last, so any rank that could
    # land on a NULL row is a cross-engine trap — and a NULL length is
    # not a length
    w = Window.partitionBy(group_col).orderBy(F.col("__len"), F.col(id_col))
    ranked = (
        df.select(
            F.col(group_col), F.col(id_col), F.col(len_col).cast("long").alias("__len")
        )
        .filter(F.col("__len").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
    )
    counts = ranked.groupBy(group_col).agg(F.count("*").alias("__n"))
    bands = (
        ranked.join(F.broadcast(counts), on=group_col)
        .filter(
            (F.col("__rn") == F.greatest(F.lit(1), F.ceil(F.lit(lo) * F.col("__n"))))
            | (F.col("__rn") == F.ceil(F.lit(hi) * F.col("__n")))
        )
        .groupBy(group_col)
        .agg(
            F.min("__len").alias("p_lo"),
            F.max("__len").alias("p_hi"),
            F.min("__n").alias("n_total"),
        )
    )
    return (
        df.select(F.col(group_col), F.col(len_col).cast("long").alias("__len"))
        .join(F.broadcast(bands), on=group_col)
        .groupBy(group_col)
        .agg(
            F.min("p_lo").cast("bigint").alias("p_lo"),
            F.min("p_hi").cast("bigint").alias("p_hi"),
            F.min("n_total").cast("bigint").alias("n_total"),
            F.sum(
                (
                    (F.col("__len") >= F.col("p_lo"))
                    & (F.col("__len") <= F.col("p_hi"))
                ).cast("long")
            )
            .cast("bigint")
            .alias("n_kept"),
        )
        .withColumnRenamed(group_col, "lang")
    )


def rare_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """Per-document rare-token occurrence ratio: the fraction of a
    document's token OCCURRENCES whose corpus document frequency is
    below ``min_df`` — a fluency/quality proxy in the CCNet spirit
    (documents dominated by tokens nothing else uses are OCR garbage,
    codes, or boilerplate IDs) built entirely from integer counts, so
    it is bit-identical across engines where a log-probability
    perplexity would hinge on libm rounding.

    Returns (doc_id, n_tokens, n_rare, rare_ratio).

    Scale shape: the token-array table is materialized ONCE (it feeds
    document frequency, the occurrence join, and the per-doc totals —
    Catalyst re-runs the split per consumer otherwise); document
    frequency comes from per-doc DISTINCT tokens (map-side
    array_distinct before the explode, like vocab()), so the df
    shuffle carries one row per distinct (doc, token); per-doc totals
    are ``size(tokens)`` — pure map-side, NO explode and no shuffle;
    only the rare-occurrence join actually ships occurrences, keyed by
    token."""
    from .dedup import ensure_parallelism, materialize_for_self_join

    toks = materialize_for_self_join(
        ensure_parallelism(df).select(
            F.col(id_col), tokens(F.col(text_col)).alias("__t")
        )
    )
    occ = toks.select(F.col(id_col), F.explode_outer("__t").alias("token")).filter(
        F.col("token").isNotNull()
    )
    dfreq = (
        toks.select(F.col(id_col), F.explode(F.array_distinct("__t")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("__df"))
    )
    rare = dfreq.filter(F.col("__df") < min_df).select("token")
    rare_occ = occ.join(rare, on="token").groupBy(id_col).agg(
        F.count("*").alias("n_rare")
    )
    totals = toks.filter(F.col("__t").isNotNull()).select(
        F.col(id_col), F.size("__t").cast("long").alias("n_tokens")
    )
    return (
        totals.join(rare_occ, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("n_rare"), F.lit(0)).cast("bigint").alias("n_rare"),
        )
        .withColumn(
            "rare_ratio",
            F.col("n_rare").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def sequence_pack_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 4096,
    chunk_docs: int = 100_000,
    base_tokens: int = 0,
) -> DataFrame:
    """Greedy concat-and-split sequence packing (the standard LLM
    pre-training layout: concatenate documents in a deterministic
    order, slice into fixed ``seq_len``-token training sequences):
    for every document, which training sequence (bin) it starts in, at
    what token offset, and how many sequences it spans.

    Returns (doc_id, n_tok, bin_id, bin_offset, n_bins_spanned) —
    what a packing job needs to materialize shards, and what capacity
    planning reads (bins = ceil(total_tokens / seq_len)).

    Everything is integer arithmetic on BPE-proxy token counts, so the
    layout is bit-identical across engines.  The global running token
    count — the one inherently sequential quantity — runs through the
    two-pass chunked prefix sum (operators/prefix.py): parallelism is
    doc-id chunks, NOT one task for the whole corpus, and the offset
    window runs over chunk TOTALS (corpus/chunk_docs rows).

    ``base_tokens`` shifts the whole layout by an already-packed
    token count — the INCREMENTAL case: a new batch continues the
    stream exactly where a previous packing run stopped (possibly
    mid-sequence), so append-mode shard writers produce the same
    layout a one-shot run over the concatenated corpus would."""
    from .dedup import ensure_parallelism

    d = ensure_parallelism(df).select(
        F.col(id_col), bpe_token_count(F.col(text_col)).cast("long").alias("n_tok")
    )
    return pack_layout_over(d, id_col, seq_len, chunk_docs, base_tokens).select(
        id_col, "n_tok", "bin_id", "bin_offset", "n_bins_spanned"
    )


def pack_layout_over(
    d: DataFrame,
    id_col: str,
    seq_len: int,
    chunk_docs: int = 100_000,
    base_tokens: int = 0,
    n_tok: Column | None = None,
) -> DataFrame:
    """Attach the packing layout columns (n_tok, bin_id, bin_offset,
    n_bins_spanned) to ANY per-document frame in place — the carrier
    shape :func:`sequence_pack_stats` shares with the shard
    materializer, which runs the layout directly over the token-id
    table (``n_tok = size(ids)``) so no corpus-sized join is ever
    needed between layout and content."""
    from .prefix import chunked_running_sum

    if n_tok is not None:
        d = d.withColumn("n_tok", n_tok.cast("long"))
    cum = chunked_running_sum(
        d,
        key_cols=[],
        order_cols=[id_col],
        value=F.col("n_tok"),
        chunk=F.floor(F.col(id_col) / F.lit(chunk_docs)),
        out_col="__cum",
    )
    prev = F.col("__cum") - F.col("n_tok") + F.lit(int(base_tokens))
    end = F.col("__cum") + F.lit(int(base_tokens))
    bin_id = F.floor(prev / F.lit(seq_len)).cast("long")
    spans = F.when(
        F.col("n_tok") > 0,
        F.floor((end - 1) / F.lit(seq_len)).cast("long") - bin_id + 1,
    ).otherwise(F.lit(1).cast("long"))
    return (
        cum.withColumn("bin_id", bin_id.cast("bigint"))
        .withColumn("bin_offset", (prev % F.lit(seq_len)).cast("bigint"))
        .withColumn("n_bins_spanned", spans.cast("bigint"))
        .withColumn("n_tok", F.col("n_tok").cast("bigint"))
        .drop("__cum")
    )


def contamination_stats(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document with at
    least one full ``n``-token shingle, the fraction of its DISTINCT
    n-gram shingles that occur anywhere in the benchmark (eval) set —
    the GPT-3/Llama-style n-gram-overlap contamination check.

    Returns (id, n_ngrams, n_contaminated, contamination_frac).

    Scale shape: the benchmark n-gram set (eval suites — small by
    nature) is distinct-ed and BROADCAST, so the corpus side is one
    map-side explode + broadcast hash join with map-side partial
    aggregation on the doc id: the only shuffle carries one row per
    (mapper, doc).  Corpus text never moves; at 100 TB the cost is
    the corpus scan."""
    from .dedup import _shingle_arrays

    c = _shingle_arrays(corpus, text_col, id_col, n)
    b = (
        _shingle_arrays(bench, text_col, id_col, n)
        .select(F.explode_outer("__arr").alias("__s"))
        .filter(F.col("__s").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ex = c.select(
        F.col(id_col),
        F.size("__arr").alias("n_ngrams"),
        F.explode_outer("__arr").alias("__s"),
    )
    j = ex.join(F.broadcast(b), on="__s", how="left")
    # n_ngrams is aggregated with max() so the >= 1 gate is a HAVING
    # over an AGGREGATE OUTPUT.  Grouping by n_ngrams and filtering on
    # it instead lets Catalyst push the predicate through the
    # aggregate, the join, and the projection — substituting the whole
    # shingle-transform expression below the parallelism repartition,
    # where it re-runs serially on the unsplit input (observed 0.6 s
    # -> 7.7 s on the sf0.1 corpus scan).
    return (
        j.groupBy(id_col)
        .agg(
            F.max("n_ngrams").cast("bigint").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_contaminated"),
        )
        .filter(F.col("n_ngrams") >= 1)
        .select(
            F.col(id_col),
            "n_ngrams",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("contamination_frac"),
        )
    )


#: per-stratum keep rates for the sampling demo — parts per million so
#: the keep decision is exact integer arithmetic in any engine.
#: Covers every language in the testdata corpus; unknown strata keep 0.
SAMPLE_RATES_PPM = {
    "en": 800_000,
    "es": 500_000,
    "fr": 400_000,
    "de": 400_000,
    "zh": 300_000,
    "und": 100_000,
}


def stratified_sample_stats(
    df: DataFrame,
    rates_ppm: dict[str, int] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling (the data-mixing step of a
    training pipeline): keep a document iff the first 8 hex chars of
    ``md5(id)``, taken mod 1e6, fall under its stratum's
    parts-per-million rate.  Hash-based, so the sample is exactly
    reproducible across engines, runs, and cluster sizes — no RNG, no
    seed plumbing, and adding documents never flips existing keep
    decisions.

    Returns (stratum, n_docs, n_kept, realized_rate) per stratum.

    Scale shape: the keep decision is a pure map-side column
    expression; the only shuffle is the per-stratum count aggregate
    (map-side partial combine, one row per (mapper, stratum))."""
    rates = rates_ppm or SAMPLE_RATES_PPM
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(1_000_000)
    rate = F.lit(None).cast("long")
    expr = None
    for stratum, ppm in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        expr = F.when(cond, F.lit(int(ppm))) if expr is None else expr.when(cond, F.lit(int(ppm)))
    rate = expr.otherwise(F.lit(0))
    kept = (bucket < rate).cast("long")
    return (
        df.select(F.col(stratum_col).alias("stratum"), kept.alias("__kept"))
        .groupBy("stratum")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__kept").cast("bigint").alias("n_kept"),
            (F.sum("__kept").cast("double") / F.count("*").cast("double")).alias(
                "realized_rate"
            ),
        )
    )


# BM25 constants.  k1+1, 1-b and b are emitted as the SAME literals in
# the oracle twin so both engines parse identical doubles.
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25-style relevance score for a fixed query-term
    list (Robertson/Sparck Jones probabilistic ranking — the lexical
    retrieval baseline a data-curation pipeline uses to mine topical
    subsets from a corpus).  One deviation from textbook BM25, on
    purpose: the idf factor is the RATIONAL odds form
    ``(N - df + 0.5) / (df + 0.5)`` without the ``log`` — log is not
    required to be correctly rounded by IEEE 754, so ``ln`` from two
    libms can differ in the last ulp and break value-exact
    cross-engine checks.  The rational form is a strictly monotone
    transform of the same odds, preserving every ranking property,
    and consists only of correctly-rounded +,-,*,/ — bit-identical
    in any IEEE engine evaluating the same expression tree.

    Scale shape: tf and dl come straight from the per-row token array
    (map-side, no explode/shuffle); N, avgdl and each term's df are
    ONE tiny aggregate (conditional sums, map-side partial combine)
    broadcast back as a 1-row cross join.  Score is then a pure column
    expression; the only data-sized cost is the corpus scan.  At 100
    TB this is scan + a k-term scalar broadcast — no join on document
    keys at all.

    Returns ``(id, score)`` for documents matching >= 1 term; ranking
    ties are broken downstream by id.
    """
    toks = F.split(F.col(text_col), " ")

    def _is(term: str):
        # NOTE: a `lambda x, t=term:` default-arg closure would make
        # pyspark's arity inspection treat this as an (element, index)
        # lambda and bind t to the INDEX — a real closure is required
        return lambda x: x == F.lit(term)

    from .dedup import materialize_for_self_join

    # feat feeds BOTH the scalar stats aggregate and the scored
    # projection; Catalyst gives the two consumers no ReusedExchange,
    # which would tokenize and scan the corpus twice — materialize the
    # small (id, dl, tf*) table once instead
    feat = materialize_for_self_join(
        df.select(
            F.col(id_col),
            F.size(toks).cast("bigint").alias("dl"),
            *[
                F.size(F.filter(toks, _is(t))).cast("bigint").alias(f"tf{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    stats = feat.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double").alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf, dfi = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = (F.col("n_docs") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5))
        part = idf * (
            (tf * F.lit(BM25_K1 + 1.0))
            / (
                tf
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl")))
            )
        )
        score = part if score is None else score + part
    match = None
    for i in range(len(terms)):
        c = F.col(f"tf{i}") > 0
        match = c if match is None else match | c
    return scored.filter(match).select(F.col(id_col), score.alias("score"))


#: Target corpus mixture in parts-per-million per source (sums to 1e6).
#: A deterministic 4-tier pattern over the synthetic src0..src19 pool —
#: stand-in for the per-domain weights a data-mixing recipe prescribes.
TARGET_MIX_PPM = {f"src{i}": (80_000, 60_000, 40_000, 20_000)[i % 4] for i in range(20)}


def mixture_plan(
    df: DataFrame,
    target_ppm: dict[str, int] | None = None,
    source_col: str = "source",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Downsample-only data-mixing plan: given target mixture shares
    (ppm per source), compute how many documents to KEEP from each
    source so the kept corpus hits the target proportions exactly while
    only ever dropping (never repeating) documents — the standard
    mixture-rebalancing step before training-shard writes.

    The math stays INTEGER-exact end to end: the binding source s* is
    the one with the smallest n_s / t_s (ranked by one correctly-
    rounded double division, ties to the source name), and every keep
    count is ``floor(t_s * n_star / t_star)`` on bigints — so the plan
    is bit-identical across engines and reruns.

    Plan shape: one per-source count aggregate (map-side combine), a
    broadcast join against the |sources|-row literal target table, and
    a broadcast of the single binding row — nothing data-sized moves.

    ``counts`` lets a caller that already holds the per-source
    (``n_docs``) table (e.g. :func:`epoch_mix_sample`, which derives
    it from its bucket-count aggregate) supply it and skip this
    function's own corpus scan.
    """
    from .dedup import materialize_for_self_join

    rates = target_ppm or TARGET_MIX_PPM
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        sorted(rates.items()), "source string, target_ppm long"
    ).withColumnRenamed("source", source_col)
    if counts is None:
        counts = df.groupBy(source_col).agg(
            F.count("*").cast("bigint").alias("n_docs")
        )
    # FULL outer: an inner join would silently drop a target source
    # with zero corpus documents (the true binding constraint — the
    # only exact-mixture downsample is then the empty corpus) and a
    # corpus source absent from the recipe (target share 0 -> keep 0).
    # j feeds both the output and the binding-row subquery; Catalyst
    # produces no ReusedExchange for the two consumers, which would
    # mean TWO full corpus scans — materialize the |sources|-row table
    # once instead
    j = materialize_for_self_join(
        counts.join(F.broadcast(tgt), on=source_col, how="full")
        .select(
            F.col(source_col),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.col("target_ppm"), F.lit(0)).cast("bigint").alias("target_ppm"),
        )
    )
    star = (
        j.filter(F.col("target_ppm") > 0)  # zero-share rows never bind
        .orderBy(
            (F.col("n_docs").cast("double") / F.col("target_ppm")), F.col(source_col)
        )
        .limit(1)
        .select(
            F.col("n_docs").alias("n_star"), F.col("target_ppm").alias("t_star")
        )
    )
    return (
        j.crossJoin(F.broadcast(star))
        .select(
            F.col(source_col),
            F.col("n_docs"),
            F.col("target_ppm"),
            F.expr("(target_ppm * n_star) div t_star").cast("bigint").alias("n_keep"),
        )
    )


#: Range buckets the epoch-mix rank is computed within (power of two;
#: the md5 prefix is 60 bits, so each bucket spans 2**(60-10) hash
#: values).  De-skew factor for the per-source sort: the widest task
#: is widest-source/1024 instead of the whole widest source.
EPOCH_MIX_BUCKETS = 1024


def epoch_mix_sample(
    df: DataFrame,
    target_ppm: dict[str, int] | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = EPOCH_MIX_BUCKETS,
) -> DataFrame:
    """MATERIALIZE the :func:`mixture_plan` — the step between "how
    many documents per source" and an actual training epoch: per
    source, keep exactly ``n_keep`` documents, chosen by a
    deterministic content-free hash ranking (md5 of the doc id), so
    the epoch composition is reproducible across engines, reruns, and
    partitionings, and adding documents to one source never perturbs
    which documents another source keeps.

    Output: (source, doc_id, keep_rank) — ``keep_rank`` is the
    1-based position within the source's hash ranking (<= n_keep).
    The canonical interleaved epoch order is ``ORDER BY (keep_rank,
    source)`` — a round-robin across sources, the order
    ``plans/tokenized_shards.epoch_pack_stats`` packs by — which
    consumers sort by at write time; this operator deliberately does
    NOT materialize a global position: a global row_number would be a
    single-partition window (the anti-pattern the pack_sequences
    prefix-sum machinery exists to avoid).

    Scale shape — EXACT two-level rank over hash-range buckets.  A
    plain ``row_number() over (partition by source order by hash)``
    sorts each source in ONE task; real pretraining mixes are
    dominated by one source (web text at 60-90% of mass), so at
    100 TB that is a single multi-TB sort.  Instead:

    1. ``bucket = top-60-bits(md5) >> (60 - log2(n_buckets))`` — a
       RANGE bucket of the hash domain, so hash order factors exactly
       into (bucket asc, hash-within-bucket asc): the lexicographic
       order of the equal-length lowercase-hex md5 agrees with the
       numeric order of its 15-hex-digit prefix.
    2. ONE corpus aggregate counts rows per (source, bucket) — a
       |sources| x n_buckets table, materialized once; its per-source
       rollup feeds :func:`mixture_plan` (no second corpus scan).
    3. Driver-small arithmetic on that table yields each bucket's
       rank offset (exclusive prefix sum over earlier buckets) and
       PRUNES every bucket whose offset already exceeds ``n_keep`` —
       including entire zero-share sources — before anything wide
       runs.
    4. The rank window partitions by (source, bucket) over only the
       surviving ~n_keep rows; ``keep_rank = offset + local rank`` is
       bit-identical to the single-window rank by construction (no
       probabilistic margin, no fallback path).

    Wire cost: one (source,bucket)-keyed count aggregate over the
    corpus + one (source,bucket)-keyed exchange of just the kept
    candidates.  Worst task = widest-source/n_buckets.

    NULL-SOURCE CONTRACT (edge-corpus campaign, r10): a document with
    a NULL ``source_col`` belongs to no mixture component and is
    EXCLUDED from the epoch — deliberately, not as join fallout: the
    mix is defined per named source, a NULL group would otherwise
    siphon budget from real sources, and SQL engines disagree on NULL
    grouping/equi-join semantics just enough to make any other choice
    oracle-divergent.  Pinned by ``tests/test_edge_corpus.py``."""
    if n_buckets & (n_buckets - 1) or not 0 < n_buckets <= (1 << 60):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    from .dedup import materialize_for_self_join

    shift = 60 - (n_buckets.bit_length() - 1)
    h = F.md5(
        F.concat_ws("|", F.lit("mix"), F.col(id_col).cast("string"))
    )
    # NULL-source contract: enforced HERE, structurally, so no
    # downstream consumer depends on equi-join NULL fallout for it
    df = df.filter(F.col(source_col).isNotNull())
    base = df.select(
        F.col(source_col),
        F.col(id_col),
        h.alias("__h"),
        F.shiftright(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"), shift
        ).alias("__b"),
    )
    bcounts = materialize_for_self_join(
        base.groupBy(source_col, "__b").agg(
            F.count("*").cast("bigint").alias("__n")
        )
    )
    plan = mixture_plan(
        df,
        target_ppm,
        source_col,
        counts=bcounts.groupBy(source_col).agg(
            F.sum("__n").cast("bigint").alias("n_docs")
        ),
    ).select(source_col, "n_keep")
    offw = (
        Window.partitionBy(source_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep_buckets = (
        bcounts.withColumn(
            "__off", F.coalesce(F.sum("__n").over(offw), F.lit(0)).cast("bigint")
        )
        .join(F.broadcast(plan), on=source_col)
        .filter(F.col("__off") < F.col("n_keep"))
        .select(source_col, "__b", "__off", "n_keep")
    )
    w = Window.partitionBy(source_col, "__b").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return (
        base.join(F.broadcast(keep_buckets), on=[source_col, "__b"])
        .withColumn(
            "keep_rank",
            (F.col("__off") + F.row_number().over(w)).cast("bigint"),
        )
        .filter(F.col("keep_rank") <= F.col("n_keep"))
        .select(source_col, id_col, "keep_rank")
    )


def fertility_by_lang(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", lang_col: str = "lang"
) -> DataFrame:
    """Tokenizer fertility per language: BPE-proxy tokens emitted per
    whitespace word — the diagnostic that tells a pipeline which
    languages a tokenizer fragments (fertility ~1 for English-like
    text, rising for scripts the vocab under-serves) and feeds
    per-language token-budget planning next to the mixture weights.

    Exact integer sums (order-free) with one final double division per
    group — bit-identical cross-engine.  Pure map-side counting into a
    per-language aggregate: the shuffle carries |langs| rows per
    mapper."""
    t = F.col(text_col)
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        bpe_token_count(t).cast("long").alias("__bpe"),
        token_count(t).cast("long").alias("__words"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("__bpe").cast("bigint").alias("n_bpe_tokens"),
        F.sum("__words").cast("bigint").alias("n_words"),
        (F.sum("__bpe").cast("double") / F.sum("__words").cast("double")).alias(
            "fertility"
        ),
    )


# ======================================================================
# model-based quality filtering (hashed linear classifier)
# ======================================================================

#: Hashed-feature width of the linear quality classifier.  256 keeps
#: the weight vector a comfortable in-plan literal (and a readable SQL
#: list) while still spreading the corpus vocabulary thinly enough
#: that the score behaves like a real bag-of-words model.
CLF_BUCKETS = 256


def classifier_weights(n_buckets: int = CLF_BUCKETS) -> list[int]:
    """Deterministic integer stand-in for a trained linear model's
    coefficients: ``w[b] = ((b * 2654435761 + 12345) mod 1001) - 500``
    (Knuth's multiplicative constant), integers in [-500, 500].

    A production pipeline would put fastText / logistic-regression
    weights here (FineWeb-Edu-style model filtering); the weights being
    synthetic changes nothing about the execution shape, which is the
    part that matters at 100 TB — the model rides along as a broadcast
    literal and scoring is map-side.  Integer weights keep the score
    exact in any engine and any evaluation order."""
    return [((b * 2654435761 + 12345) % 1001) - 500 for b in range(n_buckets)]


def hash_bucket(tok: Column, n_buckets: int) -> Column:
    """Token -> feature bucket via the repo's cross-engine integer
    hash: the first 8 hex chars of md5 as a bigint (Spark
    ``conv(hex, 16, 10)`` == DuckDB ``('0x' || substr)::BIGINT``),
    mod the bucket count.  Always non-negative (the 32-bit value is
    positive in a 64-bit signed int)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % F.lit(
        n_buckets
    )


def _lit_long_array_sql(vals) -> str:
    """SQL text for a literal bigint array — ``F.array(*[F.lit(int)
    .cast("long") ...])`` costs ~2 py4j round-trips per element (~1-3
    ms each), i.e. ~0.5 s of pure driver latency for the 256-bucket
    classifier weight vector PER QUERY CONSTRUCTION (optimization r14,
    guide §1.2 driver overhead).  One parsed string is a single round
    trip; SQL ``L`` literals are exact bigints, so the parsed array is
    value-identical to the F.lit path (pinned by
    ``test_classifier_score_sql_twin``)."""
    return "array(" + ", ".join(f"{int(v)}L" for v in vals) + ")"


def classifier_score_expr(text: Column, weights: list[int] | None = None) -> Column:
    """Integer classifier score as a reusable column expression (the
    heart of :func:`classifier_quality`) — composable into batch
    selects and streaming gates alike."""
    w = weights if weights is not None else classifier_weights()
    warr = F.expr(_lit_long_array_sql(w))
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(warr, (hash_bucket(t, len(w)) + F.lit(1)).cast("int")),
    )


def classifier_pass_expr(text: Column, weights: list[int] | None = None) -> Column:
    """Thresholded model verdict (score > 0) — the streaming-gate
    form of the quality classifier."""
    return classifier_score_expr(text, weights) > F.lit(0)


def nb_train_weights(
    df: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    n_buckets: int = CLF_BUCKETS,
    scale: int = 1000,
) -> DataFrame:
    """TRAIN the hashed bag-of-words quality classifier on-cluster —
    the half of the model-filtering loop the repo previously stubbed
    with synthetic weights: a Naive-Bayes-flavored per-bucket purity
    weight from labeled documents, so :func:`classifier_quality` /
    the streaming gate can score with weights learned from the corpus
    itself (the fastText / FineWeb-Edu training step re-expressed as
    one aggregate).

    Output: (bucket, n_pos, n_neg, weight) — one row per OCCUPIED
    feature bucket.  ``weight = (n_pos * scale) div (n_pos + n_neg
    + 1) - scale/2`` — an integer purity score in [-scale/2,
    scale/2], monotone in the bucket's positive-class posterior under
    equal priors (the +1 is add-one smoothing's denominator; integer
    floor-div keeps it bit-identical cross-engine, where a log-odds
    formulation would hash-drift on transcendental ulps).  The bucket
    space is :func:`hash_bucket` — the SAME feature hash scoring
    uses, so a trained table plugs straight into
    ``classifier_score_expr(weights=...)`` after densifying absent
    buckets to 0.

    ``label_col`` names a boolean column of (weak) labels; when None,
    the weak label is "longer than the corpus mean" computed
    INTEGER-EXACTLY: ``length(text) * n_docs > sum(lengths)`` — no
    double comparison to flip on a ulp.

    Scale shape: one 1-row stats aggregate (broadcast back via
    crossJoin, the BM25 pattern), then explode tokens -> ONE
    bucket-keyed count aggregate with map-side combine — the shuffle
    carries <= n_buckets rows per mapper regardless of corpus size;
    flat at 100 TB like every pure-aggregate text op."""
    t = F.col(text_col)
    if label_col is None:
        stats = df.agg(
            F.count("*").cast("bigint").alias("__n"),
            F.sum(F.length(t).cast("bigint")).cast("bigint").alias("__s"),
        )
        d = df.crossJoin(F.broadcast(stats)).withColumn(
            "__lab",
            (F.length(t).cast("bigint") * F.col("__n")) > F.col("__s"),
        )
    else:
        d = df.withColumn("__lab", F.col(label_col))
    occ = d.select(F.explode(tokens(t)).alias("__tok"), "__lab")
    agg = occ.groupBy(
        hash_bucket(F.col("__tok"), n_buckets).alias("bucket")
    ).agg(
        F.sum(F.col("__lab").cast("long")).cast("bigint").alias("n_pos"),
        F.sum((~F.col("__lab")).cast("long")).cast("bigint").alias("n_neg"),
    )
    s = int(scale)
    return agg.select(
        "bucket",
        "n_pos",
        "n_neg",
        F.expr(
            f"(n_pos * {s}) div (n_pos + n_neg + 1) - {s // 2}"
        ).cast("bigint").alias("weight"),
    )


def classifier_quality(
    df: DataFrame,
    weights: list[int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a (hashed bag-of-words, linear) quality classifier to
    every document — the model-based filtering stage of an LLM data
    pipeline (the shape of fastText quality/toxicity filters and the
    FineWeb-Edu educational-value classifier).

    Per document: each whitespace token hashes to one of
    ``len(weights)`` feature buckets; ``score`` is the integer sum of
    the bucket weights over the token sequence, ``mean_weight`` the
    per-token average, and ``clf_pass`` the thresholded verdict
    (score > 0).

    Scale shape: the weight vector travels as a plan literal (a real
    model's coefficients would be broadcast the same way), and the
    whole computation is a pure column expression over the token array
    — no explode, no shuffle, no Python; corpus cost is exactly the
    Parquet scan.  Integer arithmetic end to end, so the result is
    bit-identical cross-engine (the sum is order-free; the single
    double division for ``mean_weight`` is correctly rounded from
    exact integer inputs)."""
    score = classifier_score_expr(F.col(text_col), weights)
    n = F.size(tokens(F.col(text_col))).cast("bigint")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        score.cast("bigint").alias("score"),
        (score.cast("double") / n.cast("double")).alias("mean_weight"),
        (score > F.lit(0)).alias("clf_pass"),
    )


# ======================================================================
# DSIR importance weights (Xie et al. 2023, "Data Selection via
# Importance Resampling")
# ======================================================================

#: Hashed-feature width of the DSIR importance model.  64 buckets keep
#: the two count vectors a driver-side scalar (and the oracle's weight
#: list readable) while leaving enough resolution for the ratio
#: features to separate domains on the synthetic corpus.
DSIR_BUCKETS = 64


def dsir_bucket_counts(
    df: DataFrame,
    target_pred: Column,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> tuple[list[int], list[int]]:
    """(raw, target) token counts per hashed unigram bucket — the two
    n-gram distributions DSIR compares.  One explode + ONE aggregate
    whose hash partial-combine collapses the token stream map-side, so
    the shuffle carries ``n_mappers x n_buckets`` rows regardless of
    corpus size; the driver holds 2 x n_buckets bigints (the "model",
    like the IVF trainer's k x dim centroid table).  Buckets absent
    from the corpus count 0 (the dense vectors keep oracle indexing
    aligned)."""
    from .dedup import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
        target_pred.cast("int").alias("is_t"),
    ).filter(F.col("tok").isNotNull())
    rows = (
        ex.groupBy(hash_bucket(F.col("tok"), n_buckets).alias("b"))
        .agg(F.count("*").alias("raw"), F.sum("is_t").alias("tgt"))
        .collect()
    )
    raw, tgt = [0] * n_buckets, [0] * n_buckets
    for r in rows:
        raw[int(r["b"])] = int(r["raw"])
        tgt[int(r["b"])] = int(r["tgt"])
    return raw, tgt


def dsir_importance(
    df: DataFrame,
    target_pred: Column | None = None,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance weights for target-domain resampling
    (DSIR): estimate hashed-unigram distributions over the whole corpus
    (raw) and over the target-domain subset, then score every document
    by its tokens' target/raw likelihood ratios.  The downstream
    pipeline samples documents with probability proportional to the
    weight, tilting the corpus toward the target domain.

    One documented deviation from the paper: per-token features are
    the RATIONAL add-one ratios ``(tgt_b + 1) / (raw_b + 1)`` summed
    per document (an arithmetic-mean surrogate), not the paper's
    summed log-ratios (a geometric mean).  ``log`` is not required to
    be correctly rounded by IEEE 754, so two libms can disagree in the
    last ulp and break value-exact cross-engine checks (same policy as
    bm25_scores); the additive form uses only correctly-rounded
    +,*,/ in a fixed left-to-right fold, bit-identical in any IEEE
    engine.

    Scale shape: phase 1 is one token-stream aggregate (map-side
    partial combine; shuffle bounded by mappers x buckets) whose
    2 x n_buckets result rides the driver; phase 2 is a pure column
    expression with the weight vector as a plan literal — per-doc cost
    is the scan plus one md5 per token, no joins, no per-doc shuffle.

    Returns (id, n_tokens, imp_sum, imp_mean, is_target)."""
    if target_pred is None:
        target_pred = F.col("lang") == F.lit("en")
    raw, tgt = dsir_bucket_counts(df, target_pred, n_buckets, text_col)
    # each weight is one exact-int division — correctly rounded, so the
    # Python float here equals the SQL double the oracle computes
    w = [(t + 1) / (r + 1) for t, r in zip(tgt, raw)]
    # literal weight vector from ONE parsed SQL string instead of
    # 2*n_buckets py4j round-trips (optimization r14, guide §1.2);
    # repr(float) double literals parse bit-identically — same helper
    # and twin-test discipline as similarity._lit_double_array_sql
    # (weights are exact-int divisions: always finite, so no guard
    # branch is needed)
    from .similarity import _lit_double_array_sql

    warr = F.expr(_lit_double_array_sql(w))
    toks = tokens(F.col(text_col))
    imp = F.aggregate(
        toks,
        F.lit(0.0).cast("double"),
        lambda acc, t: acc
        + F.element_at(warr, (hash_bucket(t, n_buckets) + F.lit(1)).cast("int")),
    )
    n = F.size(toks)
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        imp.alias("imp_sum"),
        (imp / n.cast("double")).alias("imp_mean"),
        target_pred.alias("is_target"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", topk: int = 20
) -> DataFrame:
    """Corpus-wide adjacent-character pair frequencies — the counting
    step of BPE tokenizer training (Sennrich et al. 2016): the pair
    chosen for each merge is the argmax of exactly this table at that
    round's symbol state (this operator reports the round-0 state;
    plans/bpe.train_bpe_merges iterates it).

    Scale shape: pairs are generated map-side from the word strings
    (substring windows — no per-char explode), and the count aggregate
    hash-combines map-side, so the shuffle carries
    ``mappers x |distinct pairs|`` rows (alphabet^2-bounded), never
    the corpus token stream.  Top-k ranked (count desc, pair asc) for
    a total order.

    Returns (pair, cnt, rank)."""
    from .dedup import ensure_parallelism

    words = (
        ensure_parallelism(df)
        .select(F.explode_outer(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").isNotNull() & (F.length("w") >= 2))
    )
    pairs = words.select(
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair")
    ).filter(F.col("pair").isNotNull())
    counts = pairs.groupBy("pair").agg(F.count("*").cast("bigint").alias("cnt"))
    order = [F.col("cnt").desc(), F.col("pair").asc()]
    top = counts.orderBy(*order).limit(topk)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "pair", "cnt", "rank"
    )


def chunk_table(
    df: DataFrame,
    chunk_words: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the retrieval/RAG
    materialization step: fixed-size word windows (``chunk_words``)
    advancing by ``stride`` (overlap = chunk_words - stride), the last
    window short if the document runs out.  Every document yields
    ``1 + ceil(max(len - chunk_words, 0) / stride)`` chunks, so the
    tail is always covered and a sub-window document yields exactly
    one chunk.

    Returns one row per chunk: (id, chunk_idx, n_words, chunk_hash) —
    the hash (md5 of the space-joined window) is the chunk's content
    address for downstream embedding/dedup stages.

    Scale shape: pure generate + column expressions — the fan-out is
    map-side (explode of a per-doc index sequence, ~len/stride rows
    per doc), there is no shuffle at all, and the token array is
    sliced per chunk without re-tokenizing.  Integer arithmetic and
    md5 only — bit-identical cross-engine."""
    toks = tokens(F.col(text_col))
    n = (
        F.lit(1)
        + F.floor(
            (F.greatest(F.size(toks) - F.lit(chunk_words), F.lit(0))
             + F.lit(stride - 1))
            / F.lit(stride)
        )
    ).cast("int")
    base = df.select(F.col(id_col), toks.alias("__t"), n.alias("__n"))
    ex = base.select(
        F.col(id_col),
        F.col("__t"),
        F.explode_outer(F.sequence(F.lit(0), F.col("__n") - 1)).alias("ci"),
    ).filter(F.col("ci").isNotNull())
    ch = F.slice(F.col("__t"), F.col("ci") * stride + F.lit(1), F.lit(chunk_words))
    return ex.select(
        F.col(id_col),
        F.col("ci").cast("bigint").alias("chunk_idx"),
        F.size(ch).cast("bigint").alias("n_words"),
        F.md5(F.array_join(ch, " ")).alias("chunk_hash"),
    )


def bigram_novelty(
    df: DataFrame,
    rare_threshold: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-level novelty statistics — the integer-exact proxy for
    LM-perplexity filtering (CCNet scores documents with a KenLM
    n-gram model; the signal that survives without libm floats is
    "how many of this document's word bigrams are rare corpus-wide").
    High novelty = unusual word sequences (gibberish, boilerplate
    mashups, or genuinely novel text — the tails a curation pass
    inspects); near-zero = formulaic text.

    Per document: ``n_bigrams``, ``n_rare`` (bigrams whose CORPUS
    occurrence count < rare_threshold... i.e. count == 1 at the
    default: seen nowhere else), and ``novelty`` = n_rare/n_bigrams.
    Documents with < 2 words have no bigrams and are omitted (same
    contract as rare_token_stats' df basis).

    Scale shape (COMMON-SET SUBTRACT, round-7 rework of this family's
    worst-in-repo 100x curve, VERDICT r6 #9): the corpus count
    aggregate keeps only the COMMON side (count >= rare_threshold) —
    a distinct-bigram-bounded table that is orders of magnitude
    smaller than the occurrence stream wherever rare bigrams dominate
    (the exact regime that made the old shape expensive) — and n_rare
    falls out as ``n_bigrams - n_common_hits``.  The exploded
    occurrence table is therefore NEVER materialized or re-shuffled:
    ``n_bigrams`` is a doc-keyed map-side partial count, and the hits
    join runs against the common set, which AQE broadcast-converts at
    runtime when it fits (measured here) and degrades to a common-
    side-bounded shuffle join when a 100 TB natural corpus's common
    set outgrows broadcast — still strictly less wire than the old
    full count-table join.  All arithmetic stays integer counts plus
    one final division — bit-exact in any engine.

    Measured (100x replica corpus, warm): old inverted-index join
    1.64 s -> 52 s (32x, the repo's worst curve); this shape
    0.77 s -> 14 s (18x) with value-identical output at sf0.01 and
    sf0.1.  Round-6's other A/B (carried-min join-free variant,
    39 -> 59 s) remains rejected.  1000-executor budget: the one
    unavoidable corpus-mass shuffle is the count aggregate's
    map-side-combined partials — distinct-bigrams x mappers rows,
    the same wire class as dedup_exact's digest shuffle."""
    from .dedup import ensure_parallelism

    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i.cast("int")),
                F.lit(" "),
                F.element_at(toks, (i + F.lit(1)).cast("int")),
            ),
        ),
    )
    ex = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
    )
    common = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= rare_threshold)
        .select("g")
    )
    per_doc = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams")
    )
    hits = (
        ex.join(common, on="g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        per_doc.join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            (F.col("n_bigrams") - F.coalesce(F.col("n_common"), F.lit(0)))
            .cast("bigint")
            .alias("n_rare"),
        )
        .withColumn(
            "novelty",
            F.col("n_rare").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )
