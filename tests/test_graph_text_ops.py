"""Unit tests for the round-3 tail operators: connected components /
duplicate clusters (operators/graph.py), passage-level dedup stats
(operators/dedup.passage_dup_stats), Gopher quality rules and corpus
vocab (operators/text.py) — known fixtures with hand-computed answers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ong_tsdb_spark.operators import dedup, text
from ong_tsdb_spark.operators.graph import connected_components, duplicate_clusters


def test_connected_components_chain_and_islands(spark):
    """A diameter-7 chain (exercises pointer jumping — plain label
    propagation would need 7 rounds), a triangle-ish path, and an
    isolated pair."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
         (10, 11), (11, 12),
         (20, 21)],
        ["d1", "d2"],
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_duplicate_clusters_sizes(spark):
    edges = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 7)], ["d1", "d2"]  # unordered src/dst
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(edges).collect()
    }
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 9: (7, 2)}


def test_connected_components_convergence_rail(spark):
    edges = spark.createDataFrame([(1, 2)], ["d1", "d2"])
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(edges, max_rounds=0)


def _persistent_ids(spark):
    jsc = spark.sparkContext._jsc
    return set(jsc.getPersistentRDDs().keySet().toArray())


def test_connected_components_error_exit_frees_checkpoints(spark):
    """ADVICE r12: the non-convergence raise must release ALL support
    checkpoints — the symmetrized edge list AND the final label
    rotation — instead of leaving the label checkpoint to the 30-min
    periodic-GC sweep."""
    before = _persistent_ids(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["d1", "d2"]
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(edges, max_rounds=1)
    assert _persistent_ids(spark) - before == set()


def test_pagerank_error_exit_frees_checkpoints(spark, monkeypatch):
    """ADVICE r12: an exception mid-iteration must free the support
    checkpoints (edges / nodes / degrees and any rank rotation) on the
    way out — the deterministic-release contract holds on error exits
    too."""
    from ong_tsdb_spark.operators import graph as g

    before = _persistent_ids(spark)
    edges = spark.createDataFrame([(1, 100), (2, 100)], ["src", "dst"])

    def boom(*_a, **_k):
        raise RuntimeError("boom")

    # F.expr is first used inside the iteration body, AFTER the three
    # support checkpoints are materialized — exactly the leak window
    monkeypatch.setattr(g.F, "expr", boom)
    with pytest.raises(RuntimeError, match="boom"):
        g.pagerank_exact(edges, iters=2)
    assert _persistent_ids(spark) - before == set()


def test_free_checkpoint_failure_warns_once(spark, caplog):
    """ADVICE r12: the blanket internals-guard in
    blockstore.free_checkpoint must be observable — one warning per
    process when the private-API path stops working, silence after."""
    import logging

    from ong_tsdb_spark import blockstore

    blockstore._warned = False
    df = spark.range(5)  # not a checkpoint: the LogicalRDD path raises
    with caplog.at_level(logging.WARNING, logger="ong_tsdb_spark.blockstore"):
        blockstore.free_checkpoint(df)
        blockstore.free_checkpoint(df)
    msgs = [r for r in caplog.records
            if "free_checkpoint" in r.getMessage()]
    assert len(msgs) == 1
    blockstore._warned = False  # leave the process flag clean


W8 = "alpha bravo charlie delta echo foxtrot golf hotel"
OTHER8 = "india juliet kilo lima mike november oscar papa"


def test_passage_dup_stats_known_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, W8),                  # 1 passage, the global first occurrence
            (2, W8 + " " + OTHER8),   # 2 passages, first is a dup of doc 1's
            (3, "too short to have a full passage"),  # 7 tokens -> no row
            (4, W8 + " " + W8),       # both passages dup doc 1's
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_passages"], r["n_dup_passages"], r["dup_frac"])
        for r in dedup.passage_dup_stats(docs, passage_words=8).collect()
    }
    assert out == {
        1: (1, 0, 0.0),
        2: (2, 1, 0.5),
        4: (2, 2, 1.0),
    }


def _gopher_rows(spark, items):
    docs = spark.createDataFrame(items, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in text.gopher_quality(docs).collect()}


def test_gopher_rules_straddle_boundaries(spark):
    filler = " ".join(["word"] * 56)  # 4-char words: mean_len in band
    rows = _gopher_rows(
        spark,
        [
            # 58 words incl. 2 marker stopwords -> passes every rule
            (1, "the " + filler + " and word"),
            # under the 50-word floor
            (2, "the and " + " ".join(["word"] * 10)),
            # symbol-heavy: ### tokens push symbol_ratio over 0.1
            (3, "the " + " ".join(["###"] * 30) + " " + filler + " and"),
            # no marker stopwords at all
            (4, filler + " word word"),
            # numeric tokens sink alpha_frac below 0.8
            (5, "the " + " ".join(["1234"] * 50) + " " + " ".join(["word"] * 6) + " and"),
        ],
    )
    assert rows[1]["gopher_pass"] is True
    assert rows[1]["stop_hits"] == 2
    assert rows[2]["gopher_pass"] is False and rows[2]["n_words"] < 50
    assert rows[3]["gopher_pass"] is False and rows[3]["symbol_ratio"] >= 0.1
    assert rows[4]["gopher_pass"] is False and rows[4]["stop_hits"] == 0
    assert rows[5]["gopher_pass"] is False and rows[5]["alpha_frac"] <= 0.8
    # the passing doc's features are what a hand computation gives
    assert rows[1]["n_words"] == 59
    assert rows[1]["alpha_frac"] == 1.0
    assert rows[1]["symbol_ratio"] == 0.0


def test_vocab_tf_and_df(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], ["doc_id", "text"]
    )
    got = {
        r["token"]: (r["tf"], r["df_docs"]) for r in text.vocab(docs).collect()
    }
    assert got == {"a": (2, 1), "b": (2, 2), "c": (1, 1)}


W8B = "quick brown fox jumps over the lazy dog"


def test_contamination_known_overlap(spark):
    from ong_tsdb_spark.operators.text import contamination_stats

    bench = spark.createDataFrame([(100, W8B)], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            # 9 tokens: 2 distinct 8-grams, the first one is W8B -> 1/2
            (1, W8B + " extra"),
            # disjoint content -> 0.0
            (2, "alpha bravo charlie delta echo foxtrot golf hotel india"),
            # exact copy of the benchmark doc -> 1/1
            (3, W8B),
            # too short for any 8-gram -> no row
            (4, "short doc"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_contaminated"], r["contamination_frac"])
        for r in contamination_stats(corpus, bench, n=8).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 0, 0.0), 3: (1, 1, 1.0)}


def test_stratified_sample_deterministic(spark):
    import hashlib

    from ong_tsdb_spark.operators.text import SAMPLE_RATES_PPM, stratified_sample_stats

    rows = [(i, "en" if i % 2 == 0 else "es") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])

    def kept(doc_id, lang):
        bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1_000_000
        return bucket < SAMPLE_RATES_PPM[lang]

    expect = {}
    for i, lang in rows:
        n, k = expect.get(lang, (0, 0))
        expect[lang] = (n + 1, k + int(kept(i, lang)))

    got = {
        r["stratum"]: (r["n_docs"], r["n_kept"], r["realized_rate"])
        for r in stratified_sample_stats(docs).collect()
    }
    assert set(got) == set(expect)
    for lang, (n, k) in expect.items():
        assert got[lang] == (n, k, k / n), (lang, got[lang], (n, k))
    # rerun is bit-identical (no RNG anywhere)
    assert got == {
        r["stratum"]: (r["n_docs"], r["n_kept"], r["realized_rate"])
        for r in stratified_sample_stats(docs).collect()
    }


# ----------------------------------------------------------------------
# round-5 operators: keep-best dedup, length banding, rare tokens
# ----------------------------------------------------------------------
def test_exact_duplicates_keep_best(spark):
    """Representative = highest score, ties to lowest id — NOT first
    id (doc 1 loses to doc 3 despite the lower id)."""
    df = spark.createDataFrame(
        [
            (1, "same text", 10),
            (3, "same text", 25),   # longest copy wins
            (7, "same text", 25),   # tie on score -> id 3 keeps
            (4, "other", 5),
        ],
        "doc_id long, text string, n_chars long",
    )
    rows = {
        r["keeper_id"]: (r["keeper_score"], r["n_copies"])
        for r in dedup.exact_duplicates_keep_best(df).collect()
    }
    assert rows == {3: (25, 3), 4: (5, 1)}


def test_length_band_stats_discrete_percentiles(spark):
    """n=20 per lang, lengths 1..20: k05 = ceil(0.05*20) = 1 -> p_lo
    is the 1st order statistic, k95 = ceil(0.95*20) = 19 -> p_hi the
    19th; band [1,19] keeps 19 of 20."""
    rows = [(i, "en", i) for i in range(1, 21)] + [(100 + i, "es", 10 * i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {r["lang"]: r for r in text.length_band_stats(df).collect()}
    assert (got["en"]["p_lo"], got["en"]["p_hi"]) == (1, 19)
    assert (got["en"]["n_total"], got["en"]["n_kept"]) == (20, 19)
    # es: n=10, k05 = ceil(0.5) = 1, k95 = ceil(9.5) = 10 -> keeps all
    assert (got["es"]["p_lo"], got["es"]["p_hi"]) == (10, 100)
    assert (got["es"]["n_total"], got["es"]["n_kept"]) == (10, 10)


def test_rare_token_stats(spark):
    """'the' appears in all 3 docs (df=3, not rare at min_df=3);
    'qzx'/'wvu' are df=1 rares; doc 3 is all-rare."""
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog ran qzx"),
            (3, "qzx wvu the"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.rare_token_stats(df, min_df=2).collect()}
    # min_df=2: rare iff df < 2 (df==1). 'the' df=3, 'qzx' df=2 -> not rare
    assert (got[1]["n_tokens"], got[1]["n_rare"]) == (3, 2)      # cat, sat
    assert (got[2]["n_tokens"], got[2]["n_rare"]) == (4, 2)      # dog, ran
    assert (got[3]["n_tokens"], got[3]["n_rare"]) == (3, 1)      # wvu
    assert got[3]["rare_ratio"] == pytest.approx(1 / 3)


def test_sequence_pack_stats(spark):
    """Hand-computed packing layout with seq_len=10: docs of 4/8/3
    tokens -> cums 4/12/15; doc 2 starts in bin 0 at offset 4 and
    SPANS the bin boundary; doc 3 starts in bin 1."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h i j k l"), (3, "m n o")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in text.sequence_pack_stats(df, seq_len=10, chunk_docs=2).collect()
    }
    assert (got[1]["bin_id"], got[1]["bin_offset"], got[1]["n_bins_spanned"]) == (0, 0, 1)
    assert (got[2]["bin_id"], got[2]["bin_offset"], got[2]["n_bins_spanned"]) == (0, 4, 2)
    assert (got[3]["bin_id"], got[3]["bin_offset"], got[3]["n_bins_spanned"]) == (1, 2, 1)
    # chunk boundary at doc 3 (chunk_docs=2) must not change the layout
    # vs a single chunk
    got1 = {
        r["doc_id"]: r
        for r in text.sequence_pack_stats(df, seq_len=10, chunk_docs=100).collect()
    }
    for k in got:
        assert tuple(got[k]) == tuple(got1[k])


def test_similarity_null_vector_robustness(spark):
    """Code-review r9: NULL vectors (or null-element vectors) must not
    crash or pollute the ANN/dedup paths — ADC top-k drops NULL-code
    rows instead of ranking them FIRST (asc() is nulls-first), the
    float IVF trainer skips them and tolerates n < k, semantic_dedup's
    BLAS path routes them around the matmul with the same keep=True /
    cid=NULL answer as the reference path, and a zero-norm vector in a
    blocked pair yields NULL cosine (not an ANSI divide error)."""
    from ong_tsdb_spark.operators.similarity import (
        cosine_pairs_blocked,
        pq_adc_topk,
        semantic_dedup,
        train_ivf_centroids,
        train_pq_codebooks_exact,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], "a"),
        (2, [0.9, 0.1, 0.0, 0.0], "a"),
        (3, None, "a"),
        (4, [0.0, 1.0, None, 0.0], "a"),
        (5, [0.0, 0.0, 0.0, 0.0], "a"),  # zero norm
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )

    # trainer: null-safe, n < k returns what exists
    cents = train_ivf_centroids(df, k=8, iters=1)
    assert 1 <= len(cents) <= 3

    # ADC: null-code rows never appear in the ranking
    books = train_pq_codebooks_exact(df, m=2, k=2, iters=1)
    top = pq_adc_topk(df, books, [1.0, 0.0, 0.0, 0.0], topk=5)
    ids = [r["vec_id"] for r in top.collect()]
    assert 3 not in ids and 4 not in ids
    assert ids[0] in (1, 2)

    # semantic dedup: BLAS and reference paths agree on null rows
    blas = {r["vec_id"]: (r["cid"], r["keep"])
            for r in semantic_dedup(df, k=2, iters=1, use_blas=True).collect()}
    ref = {r["vec_id"]: (r["cid"], r["keep"])
           for r in semantic_dedup(df, k=2, iters=1, use_blas=False).collect()}
    assert set(blas) == set(ref) == {1, 2, 3, 4, 5}
    assert blas[3] == (None, True) and blas[4] == (None, True)
    assert blas[3] == ref[3] and blas[4] == ref[4]

    # blocked pairs: zero-norm cosine is NULL, job survives
    pairs = cosine_pairs_blocked(
        df.withColumn("blk", F.lit(1)), block_col="blk", threshold=-2.0
    )
    got = {(r["d1"], r["d2"]): r["cosine"] for r in pairs.collect()}
    assert any(v is None for k, v in got.items() if 5 in k) or not any(
        5 in k for k in got
    )


def test_pair_family_drops_nonfinite_vectors(spark):
    """Code-review r9 (second pass): a NaN-element vector's cosine is
    NaN, which SQL engines rank ABOVE the threshold while numpy ranks
    it below — the pair family is defined over finite vectors only,
    on the fold path, the BLAS path, and (pinned by the edge corpus)
    the oracles.  A dirty QUERY vector raises a clear ValueError in
    the exact-search entry points instead of a driver TypeError."""
    from ong_tsdb_spark.operators.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_blocked_numpy,
        quantize_query_or_raise,
    )

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.9, 0.1], "a"),
        (3, [float("nan"), 1.0], "a"),
        (4, [float("inf"), 0.0], "a"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    for fn in (cosine_pairs_blocked, cosine_pairs_blocked_numpy):
        got = {(r["d1"], r["d2"]) for r in
               fn(df, block_col="label", threshold=-2.0).collect()}
        assert got == {(1, 2)}, (fn.__name__, got)

    with pytest.raises(ValueError, match="not searchable"):
        quantize_query_or_raise([1.0, float("nan")])
    with pytest.raises(ValueError, match="not searchable"):
        quantize_query_or_raise([1.0, 1.0e30])
    assert quantize_query_or_raise([1.0, -1.0]) == [1 << 20, -(1 << 20)]


def test_keep_best_fractional_scores(spark):
    """Code-review r9: fractional quality scores must rank exactly —
    the old cast('long') truncated 0.12 and 0.98 both to 0 and the
    keeper degenerated to lowest-id."""
    from ong_tsdb_spark.operators.dedup import exact_duplicates_keep_best

    df = spark.createDataFrame(
        [
            (1, "same text", 0.12),
            (2, "same text", 0.98),
            (3, "same text", None),
        ],
        "doc_id long, text string, score double",
    )
    row = exact_duplicates_keep_best(df, score_col="score").collect()[0]
    assert row["keeper_id"] == 2  # highest REAL score, not lowest id
    assert row["n_copies"] == 3


def test_band_structs_rejects_indivisible(spark):
    from ong_tsdb_spark.operators.dedup import band_structs_expr

    with pytest.raises(ValueError, match="divisible"):
        band_structs_expr(16, 3)
