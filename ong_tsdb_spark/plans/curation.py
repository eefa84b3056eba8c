"""Corpus-curation composition: the capstone keep/drop verdict and its
incremental (persisted-centroid) variant.

The report joins three already-value-checked operator families into one
per-document verdict (exact-dup keeper, Gopher quality, SemDedup):
``ong_tsdb_spark.entry_queries.corpus_curation_report`` registers the
trained-per-run form with a full DuckDB oracle twin.  This module holds
the shared composition so a pipeline can also run it INCREMENTALLY:
train the SemDedup coarse quantizer once on a corpus snapshot, persist
the k x dim integer centroids, and re-run curation on grown corpora
paying only assignment (one Arrow matmul pass) instead of the Lloyd's
iterations — the dominant cost of the report (~60% at sf0.1).

Because the whole quantizer is integer-exact
(:func:`...similarity.train_ivf_centroids_exact`), the incremental run
is bit-identical to a fresh run over the same corpus — pinned by
``tests/test_operators.py::test_curation_report_incremental_parity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ong_tsdb_spark.operators import dedup, similarity, text


def curation_report(
    docs: DataFrame,
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """One row per document: ``(doc_id, exact_keep, gopher_pass,
    semantic_keep, near_dup, keep)`` where ``keep`` is the conjunction
    a shard writer filters on.  ``embeddings.vec_id`` must be
    ``doc_id``.

    ``near_dup`` (VERDICT r10 #5) reports whether the document has at
    least one MinHash-LSH candidate — computed through the STATS-ONLY
    ``lsh_candidate_pairs(summarize=True)`` path (per-bucket window
    count, one per-doc aggregate), NEVER the pair stream: the report
    needs a per-doc flag, and materializing C(g,2) pairs for a hot
    boilerplate group of size g to derive a boolean is exactly the
    skew amplification the r10 bench measured (1.71x) on the
    output-bound pair mode.  The flag is exact (bucket size >= 2 iff
    the doc appears in >= 1 candidate pair); it is REPORTED, not
    conjoined into ``keep`` — near-dup resolution (which member to
    keep) belongs to the clustering consumers that do need pairs.

    Plan shape: fingerprints + gopher features come from one corpus
    scan (map-side exprs); the only data-sized shuffles are the digest
    groupBy/join pair, the band-signature bucket count, and the final
    ``doc_id`` joins against the embedding-derived keep flags.  With
    ``centroids`` supplied, no training jobs run at all."""
    g = text.gopher_quality(docs).select("doc_id", "gopher_pass")
    nd = dedup.lsh_candidate_pairs(docs, summarize=True).select(
        "doc_id", F.col("has_candidate").alias("__nd")
    )
    fp = dedup.materialize_for_self_join(
        docs.select("doc_id", F.md5("text").alias("fingerprint"))
    )
    win = dedup.keeper_groups(fp)
    ex = fp.join(win.select("fingerprint", "keeper_id"), on="fingerprint").select(
        "doc_id", (F.col("doc_id") == F.col("keeper_id")).alias("exact_keep")
    )
    sem = similarity.semantic_dedup(
        emb, k=k, iters=iters, threshold=threshold, centroids=centroids
    ).select(F.col("vec_id").alias("doc_id"), F.col("keep").alias("semantic_keep"))
    return (
        ex.join(g, on="doc_id")
        .join(sem, on="doc_id")
        .join(nd, on="doc_id", how="left")
        .select(
            "doc_id",
            "exact_keep",
            "gopher_pass",
            "semantic_keep",
            F.coalesce(F.col("__nd"), F.lit(False)).alias("near_dup"),
            (
                F.col("exact_keep") & F.col("gopher_pass") & F.col("semantic_keep")
            ).alias("keep"),
        )
    )


def train_curation_centroids(
    emb: DataFrame, path: str, k: int = 8, iters: int = 2
) -> list[list[int]]:
    """Train the SemDedup coarse quantizer and persist it to ``path``
    (atomic JSON sidecar).  Returns the centroids so the caller can use
    them immediately."""
    cents = similarity.train_ivf_centroids_exact(emb, k=k, iters=iters)
    similarity.write_exact_centroids(path, cents)
    return cents


def curation_report_incremental(
    docs: DataFrame,
    emb: DataFrame,
    centroids_path: str,
    threshold: float = 0.4,
) -> DataFrame:
    """The report against a persisted quantizer: loads the centroids
    trained by :func:`train_curation_centroids` and skips the Lloyd's
    jobs.  ``k``/``iters`` are properties of the persisted file."""
    cents = similarity.read_exact_centroids(centroids_path)
    return curation_report(docs, emb, threshold=threshold, centroids=cents)
