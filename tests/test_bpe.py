"""Distributed BPE trainer (plans/bpe.py) vs an independent pure-
Python reference implementation of the greedy merge algorithm."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from ong_tsdb_spark.plans import bpe


def _py_train(texts, n_merges, min_count=2):
    """Independent reference trainer: per-occurrence pair counts,
    (count desc, 'a b' string asc) argmax, greedy merge application."""
    words = [list(w) for t in texts for w in t.split(" ") if len(w) >= 1]
    merges = []
    for _ in range(n_merges):
        cnt: dict[str, int] = {}
        for syms in words:
            for i in range(len(syms) - 1):
                p = syms[i] + " " + syms[i + 1]
                cnt[p] = cnt.get(p, 0) + 1
        if not cnt:
            break
        pair, n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        a, b = pair.split(" ")
        merges.append((a, b))
        words = [bpe.merge_word_py(s, a, b) for s in words]
    return merges


def test_train_bpe_merges_matches_python(spark):
    texts = [
        "the theatre then thens",
        "there is the thesis these theses",
        "other ether tether the",
        "aaaa aaa aa the",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = bpe.train_bpe_merges(df, n_merges=8)
    want = _py_train(texts, 8)
    assert got == want
    assert len(got) == 8  # this corpus has at least 8 frequent pairs


def test_train_bpe_merges_regex_specials_and_early_stop(spark):
    """Merged symbols containing regex/replacement metacharacters
    ($, ., \\, +) must merge correctly, and training stops once the
    best pair drops under min_count."""
    texts = ["$a. $a. $a. x\\y+ x\\y+ zq"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = bpe.train_bpe_merges(df, n_merges=20)
    want = _py_train(texts, 20)
    assert got == want
    # 'zq' occurs once -> never merged; everything frequent got merged
    assert ("z", "q") not in got


def test_apply_merges_py_roundtrip():
    merges = [("t", "h"), ("th", "e")]
    assert bpe.apply_merges_py("the", merges) == ["the"]
    assert bpe.apply_merges_py("then", merges) == ["the", "n"]
    assert bpe.apply_merges_py("tth", merges) == ["t", "th"]
    # overlapping occurrences merge greedily left-to-right
    assert bpe.merge_word_py(list("aaa"), "a", "a") == ["aa", "a"]


def test_tokenize_with_merges_matches_python(spark):
    """Distributed tokenization under a learned merge table equals the
    per-word pure-Python reference (word boundaries flattened),
    including regex-special merged symbols."""
    texts = [
        "the theatre then",
        "other ether tether",
        "$a. $a. thens x\\y+",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_merges(df, n_merges=6)
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe.tokenize_with_merges(df, merges).collect()
    }
    for i, t in enumerate(texts):
        want = [s for w in t.split(" ") for s in bpe.apply_merges_py(w, merges)]
        assert got[i] == (want, len(want)), (i, got[i], want)


def test_tokenize_expr_is_shuffle_free(spark):
    df = spark.createDataFrame([(0, "the the the")], "doc_id long, text string")
    out = bpe.tokenize_with_merges(df, [("t", "h"), ("th", "e")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bpe_newlines_and_empty_words(spark):
    """Line terminators are ordinary symbols (DOTALL symbolization;
    \\z anchoring so a trailing newline symbol cannot be merged
    across), and empty words from consecutive spaces contribute no
    tokens — both pinned against the pure-Python reference."""
    texts = ["a\nb a\nb qa\n qa\n", "the  the", " lead trail "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_merges(df, n_merges=6)
    want_merges = _py_train(texts, 6)
    assert merges == want_merges
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe.tokenize_with_merges(df, merges).collect()
    }
    for i, t in enumerate(texts):
        want = [
            s
            for w in t.split(" ")
            if len(w) >= 1
            for s in bpe.apply_merges_py(w, merges)
        ]
        assert got[i] == (want, len(want)), (i, got[i], want)
