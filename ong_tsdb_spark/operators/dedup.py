"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard (inverted-index join), MinHash+LSH, SimHash.

Scale notes (the point of each design):

* **exact**: hash-groupBy on md5(text) — one shuffle keyed by digest,
  16-byte keys instead of full documents.  At 100 TB this is the only
  exact method that doesn't move document bodies through the shuffle.
* **n-gram Jaccard**: shingle -> explode -> self-join on shingle is an
  *inverted-index* join: pair candidates are generated only for docs
  sharing a shingle (vs O(n^2) crossJoin).  Hot shingles are the skew
  risk — ``max_shingle_freq`` drops shingles shared by more than N
  docs (stopword-like shingles carry no dedup signal but quadratic
  pair cost), which bounds the blowup exactly like salting would.
* **MinHash+LSH**: constant-size signatures (k hashes) per doc, then a
  band-bucket equi-join — candidate generation cost is linear in docs
  x bands, independent of document length.  The hash is md5 (same
  digest available in the oracle engine), min over hex strings.
* **SimHash**: 64-bit xxhash64-based signed-bit aggregate; hamming
  proximity via banded exact match over 16-bit sub-keys.

No Python UDFs anywhere — shingling/hashing are Catalyst lambda
expressions inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by content digest; keep the min id as the canonical doc.
    Returns (fingerprint, keeper_id, n_copies) per distinct content."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


# ----------------------------------------------------------------------
# shingling
# ----------------------------------------------------------------------
def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>; docs shorter than n
    words produce an empty array.  1-based element_at matches the
    oracle's 1-based list indexing."""
    toks = F.split(text, " ")
    count = F.size(toks)
    idx = F.when(count >= n, F.sequence(F.lit(1), count - F.lit(n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) rows, distinct per doc — the inverted index."""
    return (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


# ----------------------------------------------------------------------
# n-gram Jaccard via inverted-index join
# ----------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs (d1 < d2) with shingle-set Jaccard >= threshold.
    Returns (d1, d2, jaccard double — exact int division, so
    bit-identical across engines)."""
    sh = shingle_table(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
        sh = (
            sh.join(F.broadcast(freq.filter(F.col("__f") > max_shingle_freq)), "shingle", "left_anti")
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .select("d1", "d2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """(id, seed, h): per-doc min of md5(seed || '|' || shingle) for
    each of ``num_hashes`` seeded hash functions.  md5 hex min is a
    portable MinHash (same digest + binary collation in the oracle)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    return (
        sh.select(F.col(id_col), F.col("shingle"), seeds)
        .withColumn(
            "h", F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")))
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("h"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs agreeing on all hashes of at
    least one band.  Returns distinct (d1 < d2).

    The band signature join is an equi-join on (band, sig) — at scale
    the shuffle key cardinality is ~n_docs x n_bands and each bucket
    is tiny unless documents truly collide."""
    sh = shingle_table(df, text_col, id_col, n)
    mh = minhash_signatures(sh, id_col, num_hashes)
    band = F.expr("seed div " + str(band_size)).alias("band")
    sigs = (
        mh.groupBy(F.col(id_col), band)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "h"))), lambda s: s["h"]
                ),
                "",
            ).alias("sig")
        )
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, on=["band", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens: for each bit, sum +1/-1 by
    token-hash bit, take the sign.  xxhash64 is JVM-side; the digest
    differs from any oracle engine's hash, so this operator gets a
    rows-only correctness check (documented non-SQL-expressible)."""
    toks = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    per_tok = df.select(F.col(id_col), toks).withColumn("h", F.xxhash64("tok"))
    bit_cols = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = per_tok.groupBy(id_col).agg(*bit_cols)
    sig = F.lit(0).cast("long")
    for b in range(64):
        # shiftleft wraps at bit 63 (sign bit) — fine for a hash key
        sig = sig + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidate_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash sub-bands (docs within
    hamming distance 3 of each other share at least one of 4 bands)."""
    sigs = simhash(df, text_col, id_col)
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.expr(f"(simhash >> {16 * i}) & 65535").alias("key"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )
