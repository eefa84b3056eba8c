"""Hypothesis property tests for the round-5-continuation operators:
random corpora checked against independent pure-Python models (the
same twin-model discipline as the pack/gap-fill property suites)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ong_tsdb_spark.operators import text
from ong_tsdb_spark.plans import bpe

# words over a tiny alphabet so duplicate pairs/buckets are common;
# texts are single-space joined (the corpus convention)
_word = st.text(alphabet="abz$.", min_size=1, max_size=5)
_text = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=6)

_SLOW = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _bucket(tok: str, n: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


@pytest.mark.slow
@settings(**_SLOW)
@given(texts=_corpus)
def test_classifier_quality_property(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.classifier_quality(df).collect()}
    w = text.classifier_weights()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        score = sum(w[_bucket(tok, len(w))] for tok in toks)
        assert got[i]["score"] == score
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["mean_weight"] == score / len(toks)


@pytest.mark.slow
@settings(**_SLOW)
@given(texts=_corpus, chunk_words=st.sampled_from([2, 3, 5]), stride=st.sampled_from([1, 2, 3]))
def test_chunk_table_property(spark, texts, chunk_words, stride):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = text.chunk_table(df, chunk_words=chunk_words, stride=stride).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_words"], r["chunk_hash"]) for r in rows}
    want = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        extra = max(len(toks) - chunk_words, 0)
        n = 1 + -(-extra // stride)  # ceil
        for ci in range(n):
            win = toks[ci * stride : ci * stride + chunk_words]
            want[(i, ci)] = (
                len(win),
                hashlib.md5(" ".join(win).encode()).hexdigest(),
            )
    assert got == want
    # coverage invariant: the last chunk reaches the final token
    for i, t in enumerate(texts):
        toks = t.split(" ")
        last_ci = max(ci for (d, ci) in want if d == i)
        assert last_ci * stride + want[(i, last_ci)][0] == len(toks)


@pytest.mark.slow
@settings(**_SLOW)
@given(texts=_corpus, n_merges=st.sampled_from([1, 3, 6]))
def test_bpe_trainer_property(spark, texts, n_merges):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = bpe.train_bpe_merges(df, n_merges=n_merges)
    # independent model (duplicated here rather than imported from
    # test_bpe so each file stands alone)
    words = [list(w) for t in texts for w in t.split(" ") if len(w) >= 1]
    want = []
    for _ in range(n_merges):
        cnt: dict[str, int] = {}
        for syms in words:
            for j in range(len(syms) - 1):
                p = syms[j] + " " + syms[j + 1]
                cnt[p] = cnt.get(p, 0) + 1
        if not cnt:
            break
        pair, n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        a, b = pair.split(" ")
        want.append((a, b))
        words = [bpe.merge_word_py(s, a, b) for s in words]
    assert got == want


@pytest.mark.slow
@settings(**_SLOW)
@given(texts=_corpus)
def test_dsir_importance_property(spark, texts):
    rows = [(i, t, "en" if i % 2 == 0 else "es") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in text.dsir_importance(df).collect()}
    nb = text.DSIR_BUCKETS
    raw, tgt = [0] * nb, [0] * nb
    for _, t, lang in rows:
        for tok in t.split(" "):
            b = _bucket(tok, nb)
            raw[b] += 1
            if lang == "en":
                tgt[b] += 1
    w = [(t + 1) / (r + 1) for t, r in zip(tgt, raw)]
    for i, t, lang in rows:
        toks = t.split(" ")
        imp = 0.0
        for tok in toks:
            imp += w[_bucket(tok, nb)]
        assert got[i]["imp_sum"] == imp
        assert got[i]["imp_mean"] == imp / len(toks)


@pytest.mark.slow
@settings(**_SLOW)
@given(
    ev=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=25),
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=10,
    ),
    chunk=st.sampled_from([32, 100, 150]),
)
def test_interval_join_property(spark, ev, iv, chunk):
    """Chunk-bucketed interval join == naive cross+filter for random
    events/intervals at several chunk widths (boundaries inclusive)."""
    from ong_tsdb_spark.operators.intervaljoin import interval_join

    events = spark.createDataFrame(list(enumerate(ev)), "event_id long, us long")
    intervals = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(iv)],
        "iv_id long, start_us long, end_us long",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(events, intervals, chunk_us=chunk).collect()
    )
    want = sorted(
        (ei, ii)
        for ei, t in enumerate(ev)
        for ii, (s, ln) in enumerate(iv)
        if s <= t <= s + ln
    )
    assert got == want


@pytest.mark.slow
@settings(**_SLOW)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # user
            st.integers(min_value=0, max_value=1000),   # us
        ),
        min_size=1,
        max_size=40,
    ),
    period=st.sampled_from([7, 100, 250]),
)
def test_retention_cohorts_property(spark, events, period):
    """Cohort triangle == a direct Python model for random event logs
    at several period widths: users cohorted by first-activity period,
    counted once per active period."""
    from ong_tsdb_spark.operators.events import retention_cohorts

    df = spark.createDataFrame(
        [(u, t) for u, t in events], "user_id long, us long"
    )
    got = sorted(
        (r["cohort"], r["period"], r["periods_since"], r["n_users"])
        for r in retention_cohorts(df, period_us=period).collect()
    )
    active: dict[int, set[int]] = {}
    for u, t in events:
        active.setdefault(u, set()).add(t // period)
    want: dict[tuple[int, int], int] = {}
    for u, pers in active.items():
        cohort = min(pers)
        for p in pers:
            want[(cohort, p)] = want.get((cohort, p), 0) + 1
    assert got == sorted(
        (c, p, p - c, n) for (c, p), n in want.items()
    )


@pytest.mark.slow
@settings(**_SLOW)
@given(texts=_corpus, threshold=st.sampled_from([2, 3]))
def test_bigram_novelty_property(spark, texts, threshold):
    """Bigram novelty == a direct Python model (corpus-wide bigram
    occurrence counts, per-doc rare fraction) for random corpora at
    both the default and a higher rare threshold."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_rare"], r["novelty"])
        for r in text.bigram_novelty(df, rare_threshold=threshold).collect()
    }
    grams: dict[int, list[str]] = {}
    counts: dict[str, int] = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        gs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if gs:
            grams[i] = gs
            for g in gs:
                counts[g] = counts.get(g, 0) + 1
    want = {
        i: (
            len(gs),
            sum(1 for g in gs if counts[g] < threshold),
        )
        for i, gs in grams.items()
    }
    assert {i: (nb, nr) for i, (nb, nr, _) in got.items()} == want
    for i, (nb, nr, nov) in got.items():
        assert nov == nr / nb


@pytest.mark.slow
@settings(**_SLOW)
@given(
    n_vecs=st.integers(min_value=3, max_value=40),
    total=st.sampled_from([4, 10, 25]),
    k=st.sampled_from([2, 3]),
)
def test_topic_balanced_sample_property(spark, n_vecs, total, k):
    """Random small corpora: the keep-set must equal a direct Python
    model of the rule — integer proportional quotas over the
    integer-exact cluster assignment, filled easy-first by (sqdist,
    id).  The model reuses the trainer's own centroids/assignments
    (proven elsewhere) so THIS test isolates the quota + ranking
    logic."""
    from ong_tsdb_spark.operators import similarity

    rows = [
        (i, [float((i * 37 + j * 11) % 23 - 11) for j in range(4)])
        for i in range(n_vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    scored = {
        r["vec_id"]: (r["cid"], r["sqdist"])
        for r in similarity.centroid_distances(df, k=k, iters=2).collect()
    }
    got = sorted(
        (r["vec_id"], r["cid"], r["sqdist"], r["rank"])
        for r in similarity.topic_balanced_sample(
            df, total=total, k=k, iters=2
        ).collect()
    )
    by_cid: dict[int, list[tuple[int, int]]] = {}
    for vid, (cid, d) in scored.items():
        by_cid.setdefault(cid, []).append((d, vid))
    n = len(scored)
    want = []
    for cid, members in by_cid.items():
        quota = (total * len(members)) // n
        members.sort()
        for rank, (d, vid) in enumerate(members[:quota], start=1):
            want.append((vid, cid, d, rank))
    assert got == sorted(want)
