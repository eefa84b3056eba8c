"""Pre-tokenized fixed-length training shards (plans/tokenized_shards):
vocabulary determinism, id mapping, packing materialization, and the
binary-blob loader handoff."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ong_tsdb_spark.plans import tokenized_shards as tsh


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_deterministic_dense_ids(spark):
    """Top-V by (tf desc, token asc); ids dense from FIRST_ID."""
    df = _docs(
        spark,
        [(1, "b b b a a c"), (2, "a c d")],
    )
    v = {r["token"]: r["id"] for r in tsh.vocab_table(df, vocab_size=3).collect()}
    # tf: ' a'x2+a… — tokens include leading-space variants; check via
    # rank properties instead of hardcoding the regex split: 3 entries,
    # dense ids starting at FIRST_ID
    assert len(v) == 3
    assert sorted(v.values()) == [tsh.FIRST_ID, tsh.FIRST_ID + 1, tsh.FIRST_ID + 2]


def test_doc_token_ids_unk_and_order(spark):
    """Out-of-vocab tokens map to UNK_ID; in-vocab ids appear in
    document order; token count equals the layout's n_tok."""
    from ong_tsdb_spark.operators.text import bpe_token_count

    df = _docs(spark, [(1, "aa bb aa zz"), (2, "")])
    vocab = tsh.vocab_table(df, vocab_size=2)
    out = {r["doc_id"]: r["ids"] for r in tsh.doc_token_ids(df, vocab).collect()}
    counts = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert len(out[1]) == counts[1]
    assert out[2] == []
    assert tsh.UNK_ID in out[1]  # 'zz' (and the un-vocabbed residue)
    in_vocab = [i for i in out[1] if i >= tsh.FIRST_ID]
    assert in_vocab  # the two top tokens got real ids


def test_pack_sequences_fixture(spark):
    """Hand-checkable packing: 3 docs x known token counts, seq_len=4.
    Every sequence padded to exactly seq_len; only the last is short;
    concat order follows doc_id; checksum matches a Python model."""
    rows = [(0, "a b c"), (1, "d e f g h"), (2, "i j")]
    df = _docs(spark, rows)
    seqs = {
        r["seq_id"]: r
        for r in tsh.pack_sequences(df, vocab_size=100, seq_len=4).collect()
    }
    # 3 + 5 + 2 = 10 tokens -> bins 0,1 full, bin 2 has 2 real
    assert set(seqs) == {0, 1, 2}
    assert all(len(r["ids"]) == 4 for r in seqs.values())
    assert [seqs[i]["n_real_tokens"] for i in range(3)] == [4, 4, 2]
    assert seqs[2]["ids"][2:] == [tsh.PAD_ID, tsh.PAD_ID]
    # doc 0 contributes 3 tokens then doc 1's first token closes bin 0
    assert seqs[0]["n_docs"] == 2 and seqs[1]["n_docs"] == 1 and seqs[2]["n_docs"] == 1

    # python model of the same layout over the same ids
    vocab = tsh.vocab_table(df, vocab_size=100)
    ids = {
        r["doc_id"]: list(r["ids"]) for r in tsh.doc_token_ids(df, vocab).collect()
    }
    stream = ids[0] + ids[1] + ids[2]
    for b in range(3):
        real = stream[b * 4 : (b + 1) * 4]
        assert list(seqs[b]["ids"])[: len(real)] == real
        want = sum((p + 1) * x for p, x in enumerate(real))
        got = (
            tsh.pack_sequence_stats(df, vocab_size=100, seq_len=4)
            .filter(F.col("seq_id") == b)
            .collect()[0]["ids_checksum"]
        )
        assert got == want


def test_write_tokenized_shards_roundtrip(spark, tmp_path):
    """The binary handoff: blobs decode via the sidecar meta to
    exactly the pack_sequences ids; every blob is seq_len * itemsize
    bytes; in-shard row order is ascending seq_id."""
    rows = [(i, " ".join(f"tok{j % 7}" for j in range(i % 13 + 1))) for i in range(60)]
    df = _docs(spark, rows)
    out = str(tmp_path / "shards")
    n_shards = tsh.write_tokenized_shards(
        df, out, vocab_size=50, seq_len=16, bins_per_shard=4
    )
    meta = tsh.read_tokenizer_meta(out)
    assert meta["dtype"] == "<u2" and meta["seq_len"] == 16

    expect = {
        r["seq_id"]: list(r["ids"])
        for r in tsh.pack_sequences(df, vocab_size=50, seq_len=16).collect()
    }
    back = spark.read.parquet(out).collect()
    assert len(back) == len(expect)
    assert n_shards == len({r["shard_id"] for r in back})
    for r in back:
        arr = np.frombuffer(r["ids"], dtype=meta["dtype"])
        assert len(r["ids"]) == 16 * np.dtype(meta["dtype"]).itemsize
        assert list(arr) == expect[r["seq_id"]]
        assert r["shard_id"] == r["seq_id"] // 4

    # in-file order is training order (flow: sortWithinPartitions)
    import glob

    for shard_dir in glob.glob(out + "/shard_id=*"):
        pdf = spark.read.parquet(shard_dir).toPandas()
        assert list(pdf["seq_id"]) == sorted(pdf["seq_id"])


def test_iter_training_sequences_order(spark, tmp_path):
    """The Spark-free loader iterator yields every sequence exactly
    once, in ascending seq_id (= training) order, decoded to the same
    ids pack_sequences computed."""
    rows = [(i, " ".join(f"w{j % 5}" for j in range(i % 9 + 1))) for i in range(40)]
    df = _docs(spark, rows)
    out = str(tmp_path / "it")
    tsh.write_tokenized_shards(df, out, vocab_size=30, seq_len=8, bins_per_shard=3)
    expect = {
        r["seq_id"]: (list(r["ids"]), r["n_real_tokens"])
        for r in tsh.pack_sequences(df, vocab_size=30, seq_len=8).collect()
    }
    seen = []
    for sid, arr, nr in tsh.iter_training_sequences(out):
        assert (list(arr), nr) == expect[sid]
        seen.append(sid)
    assert seen == sorted(expect)


def test_dtype_widens_past_uint16(spark, tmp_path):
    """An ACTUAL id space past the uint16 ceiling switches blobs to
    int32 — the dtype follows the supplied vocabulary, not the
    vocab_size parameter (a 70k pre-trained vocab with the default
    vocab_size must not silently overflow uint16)."""
    big_vocab = {f"t{i}": tsh.FIRST_ID + i for i in range(70_000)}
    df = _docs(spark, [(0, "a b c d")])
    out = str(tmp_path / "wide")
    tsh.write_tokenized_shards(df, out, seq_len=4, vocab=big_vocab)
    meta = tsh.read_tokenizer_meta(out)
    assert meta["dtype"] == "<i4" and meta["vocab_size"] == 70_000
    r = spark.read.parquet(out).collect()[0]
    assert len(r["ids"]) == 4 * 4
    # and a small trained vocab with a large configured bound stays u2
    out2 = str(tmp_path / "narrow")
    tsh.write_tokenized_shards(df, out2, vocab_size=70_000, seq_len=4)
    assert tsh.read_tokenizer_meta(out2)["dtype"] == "<u2"


def test_append_replay_is_noop(spark, tmp_path):
    """Re-appending a batch whose ids are already recorded (the
    at-least-once replay after a crash past the meta commit) is an
    idempotent no-op, not a wedge-the-stream ValueError; a genuinely
    interleaved batch still raises."""
    a = [(i, "aa bb cc") for i in range(4)]
    b = [(10, "dd ee"), (11, "ff")]
    out = str(tmp_path / "r")
    tsh.write_tokenized_shards(_docs(spark, a), out, vocab_size=10, seq_len=8)
    assert tsh.append_tokenized_shards(_docs(spark, b), out) >= 1
    before = _read_all(spark, out)
    meta_before = tsh.read_tokenizer_meta(out)
    assert tsh.append_tokenized_shards(_docs(spark, b), out) == 0  # replay
    assert _read_all(spark, out) == before
    assert tsh.read_tokenizer_meta(out) == meta_before
    with pytest.raises(ValueError, match="sort after"):
        tsh.append_tokenized_shards(_docs(spark, [(11, "x"), (12, "y")]), out)


def test_write_empty_then_append(spark, tmp_path):
    """Writing an EMPTY corpus produces a valid, appendable directory
    (total_tokens 0, no boundary) instead of crashing on the
    read-back; a later append bootstraps the content."""
    out = str(tmp_path / "e")
    empty = spark.createDataFrame([], "doc_id long, text string")
    vocab = {"aa": 2, " bb": 3}
    assert tsh.write_tokenized_shards(empty, out, seq_len=4, vocab=vocab) == 0
    meta = tsh.read_tokenizer_meta(out)
    assert meta["total_tokens"] == 0 and meta["boundary"] is None
    assert tsh.append_tokenized_shards(_docs(spark, [(0, "aa bb")]), out) == 1
    assert tsh.read_tokenizer_meta(out)["total_tokens"] == 2


def _read_all(spark, out):
    return {
        r["seq_id"]: (r["ids"], r["n_real_tokens"], r["n_docs"], r["shard_id"])
        for r in spark.read.parquet(out).collect()
    }


def test_append_equals_oneshot(spark, tmp_path):
    """write(A) + append(B) must be byte-identical to write(A ++ B)
    under a shared vocabulary — including the boundary sequence that
    B's first tokens complete, its n_docs count, and total_tokens."""
    a = [(i, " ".join(f"w{j % 6}" for j in range(i % 11 + 1))) for i in range(25)]
    bt = [(i, " ".join(f"w{j % 6} x{j % 3}" for j in range(i % 7 + 1))) for i in range(25, 45)]
    dfa, dfb = _docs(spark, a), _docs(spark, bt)
    dfall = _docs(spark, a + bt)
    vocab = tsh.vocab_table(dfall, vocab_size=40)
    vmap = {r["token"]: r["id"] for r in vocab.collect()}

    one = str(tmp_path / "oneshot")
    inc = str(tmp_path / "incremental")
    tsh.write_tokenized_shards(dfall, one, vocab_size=40, seq_len=16, bins_per_shard=4, vocab=vmap)
    tsh.write_tokenized_shards(dfa, inc, vocab_size=40, seq_len=16, bins_per_shard=4, vocab=vmap)
    n = tsh.append_tokenized_shards(dfb, inc)
    assert n >= 1

    got, want = _read_all(spark, inc), _read_all(spark, one)
    assert got == want
    assert tsh.read_tokenizer_meta(inc)["total_tokens"] == tsh.read_tokenizer_meta(one)["total_tokens"]
    assert tsh.read_vocab(inc) == tsh.read_vocab(one)


def test_append_exact_boundary(spark, tmp_path):
    """An append landing exactly on a sequence boundary (rem == 0)
    starts a fresh bin and leaves prior shards untouched."""
    # 4 docs x 4 tokens = 16 = exactly one seq_len-16 bin ("aa" then
    # " bb"-style leading-space tokens — letters only, digits would
    # split into separate \p{N} tokens)
    a = [(i, "aa bb cc dd") for i in range(4)]
    b = [(10, "aa bb")]
    inc = str(tmp_path / "b")
    tsh.write_tokenized_shards(_docs(spark, a), inc, vocab_size=10, seq_len=16, bins_per_shard=2)
    before = _read_all(spark, inc)
    assert set(before) == {0} and before[0][1] == 16
    tsh.append_tokenized_shards(_docs(spark, b), inc)
    after = _read_all(spark, inc)
    assert set(after) == {0, 1}
    assert after[0] == before[0]  # boundary bin untouched
    assert after[1][1] == 2 and after[1][2] == 1
    assert tsh.read_tokenizer_meta(inc)["total_tokens"] == 18


# ----------------------------------------------------------------------
# property: pack_sequences vs a pure-Python model over random corpora
# ----------------------------------------------------------------------
import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ASCII-only corpus so the Python twin of the Java/RE2 pretokenizer is
# exact: \p{L} -> [A-Za-z], \p{N} -> [0-9] on this alphabet
_PY_BPE = _re.compile(
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\r A-Za-z0-9]+|[ \t\n\x0B\f\r]+"
)

_word = st.text(alphabet="ab1.!", min_size=0, max_size=5)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)


def _model_pack(texts: list[str], vocab_size: int, seq_len: int):
    """Pure-Python twin: tokenize, rank vocab, map ids, concat in
    doc order, slice into seq_len bins, pad the last."""
    toks = {i: _PY_BPE.findall(t) for i, t in enumerate(texts)}
    tf: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vmap = {t: tsh.FIRST_ID + i for i, (t, _) in enumerate(ranked)}
    stream: list[int] = []
    for i in sorted(toks):
        for t in toks[i]:
            stream.append(vmap.get(t, tsh.UNK_ID))
    # a bin exists iff some doc starts in it or spans it; zero-token
    # docs land in the bin at their stream position.  Reproduce via
    # the layout rule: iterate docs, track cumulative count.
    bins: dict[int, dict] = {}
    cum = 0
    for i in sorted(toks):
        n = len(toks[i])
        b0 = cum // seq_len
        spans = ((cum + n - 1) // seq_len - b0 + 1) if n > 0 else 1
        for b in range(b0, b0 + spans):
            bins.setdefault(b, {"ids": [], "n_docs": 0})
            bins[b]["n_docs"] += 1
        cum += n
    for p, x in enumerate(stream):
        bins[p // seq_len]["ids"].append(x)
    for b, rec in bins.items():
        real = rec["ids"]
        rec["n_real"] = len(real)
        rec["padded"] = real + [tsh.PAD_ID] * (seq_len - len(real))
    return bins


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=_corpus, seq_len=st.sampled_from([3, 5, 8]), vocab_size=st.sampled_from([2, 6, 50]))
def test_pack_sequences_matches_python_model(spark, texts, seq_len, vocab_size):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["seq_id"]: r
        for r in tsh.pack_sequences(df, vocab_size=vocab_size, seq_len=seq_len).collect()
    }
    want = _model_pack(texts, vocab_size, seq_len)
    assert set(got) == set(want)
    for b in want:
        assert list(got[b]["ids"]) == want[b]["padded"], (b, texts)
        assert got[b]["n_real_tokens"] == want[b]["n_real"]
        assert got[b]["n_docs"] == want[b]["n_docs"]


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(_doc, min_size=2, max_size=8),
    split=st.integers(min_value=1, max_value=7),
    seq_len=st.sampled_from([4, 7]),
)
def test_append_equivalence_property(spark, tmp_path_factory, texts, split, seq_len):
    """write(A)+append(B) == write(A++B) over random corpora and split
    points (byte equality of every stored sequence + meta), under a
    shared vocabulary."""
    split = min(split, len(texts) - 1)
    rows = list(enumerate(texts))
    dfall = spark.createDataFrame(rows, "doc_id long, text string")
    vmap = {
        r["token"]: r["id"] for r in tsh.vocab_table(dfall, vocab_size=20).collect()
    }
    base = tmp_path_factory.mktemp("prop")
    one, inc = str(base / "one"), str(base / "inc")
    kw = dict(seq_len=seq_len, bins_per_shard=2, vocab=vmap)
    tsh.write_tokenized_shards(dfall, one, **kw)
    tsh.write_tokenized_shards(
        spark.createDataFrame(rows[:split], "doc_id long, text string"), inc, **kw
    )
    tsh.append_tokenized_shards(
        spark.createDataFrame(rows[split:], "doc_id long, text string"), inc
    )
    assert _read_all(spark, inc) == _read_all(spark, one)
    mi, mo = tsh.read_tokenizer_meta(inc), tsh.read_tokenizer_meta(one)
    for k in ("total_tokens", "boundary", "last_doc_id"):
        assert mi[k] == mo[k], k


def test_append_crash_before_meta_replay_converges(spark, tmp_path):
    """The hard replay window: an append crashes AFTER rewriting shard
    files but BEFORE committing the meta.  The replayed append (same
    batch, old meta) must converge to exactly the committed state a
    crash-free run produces — the seed prefix read from the
    partially-new boundary blob is still correct because appends only
    EXTEND that sequence, and the seed doc count rides the old meta."""
    import json as _json
    import os

    a = [(i, "aa bb cc") for i in range(5)]      # 15 tokens, seq_len 8 -> mid-bin boundary
    b = [(10, "dd ee ff gg"), (11, "aa")]
    out = str(tmp_path / "cr")
    tsh.write_tokenized_shards(_docs(spark, a), out, vocab_size=10, seq_len=8, bins_per_shard=2)
    meta_before = tsh.read_tokenizer_meta(out)

    # crash-free run, to capture the expected committed state
    tsh.append_tokenized_shards(_docs(spark, b), out)
    want_rows = _read_all(spark, out)
    want_meta = tsh.read_tokenizer_meta(out)

    # simulate the crash: shard files are the NEW ones (already the
    # case on disk), but the meta rolls back to its pre-append value
    with open(os.path.join(out, "_tokenizer_meta.json"), "w") as f:
        _json.dump(meta_before, f)

    # replay the same batch against the stale meta
    tsh.append_tokenized_shards(_docs(spark, b), out)
    assert _read_all(spark, out) == want_rows
    assert tsh.read_tokenizer_meta(out) == want_meta


def test_verify_shards(spark, tmp_path):
    """verify_shards passes a healthy directory (including after an
    append), reports zero sequences on an empty one, and flags a
    corrupted meta total."""
    import json as _json
    import os

    out = str(tmp_path / "v")
    vocab = {"aa": 2, " bb": 3, " cc": 4}
    tsh.write_tokenized_shards(
        _docs(spark, [(i, "aa bb cc") for i in range(6)]),
        out, seq_len=8, bins_per_shard=2, vocab=vocab,
    )
    rep = tsh.verify_shards(spark, out)
    assert rep["ok"] and rep["holes"] == 0 and rep["total_tokens"] == 18

    tsh.append_tokenized_shards(_docs(spark, [(10, "aa bb")]), out)
    assert tsh.verify_shards(spark, out)["ok"]

    # corrupt the committed total -> flagged, with everything else fine
    meta = tsh.read_tokenizer_meta(out)
    meta["total_tokens"] += 5
    with open(os.path.join(out, "_tokenizer_meta.json"), "w") as f:
        _json.dump(meta, f)
    rep = tsh.verify_shards(spark, out)
    assert not rep["ok"] and rep["bad_blob_len"] == 0

    empty = str(tmp_path / "ve")
    tsh.write_tokenized_shards(
        spark.createDataFrame([], "doc_id long, text string"), empty,
        seq_len=8, vocab=vocab,
    )
    rep = tsh.verify_shards(spark, empty)
    assert rep["ok"] and rep["n_sequences"] == 0


def test_empty_write_guardrails(spark, tmp_path):
    """An empty corpus with no pinned vocab must raise (an empty
    TRAINED vocab would UNK every later append forever), and an empty
    overwrite of a non-empty directory clears the old shard data like
    any other overwrite."""
    import glob

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "g")
    with pytest.raises(ValueError, match="empty corpus"):
        tsh.write_tokenized_shards(empty, out, seq_len=4)

    vocab = {"aa": 2, " bb": 3}
    tsh.write_tokenized_shards(
        _docs(spark, [(0, "aa bb")]), out, seq_len=4, vocab=vocab
    )
    assert glob.glob(out + "/shard_id=*")
    tsh.write_tokenized_shards(empty, out, seq_len=4, vocab=vocab)
    assert not glob.glob(out + "/shard_id=*")  # stale shards cleared
    assert tsh.read_tokenizer_meta(out)["total_tokens"] == 0
    assert tsh.verify_shards(spark, out)["ok"]


def test_verify_shards_lost_data(spark, tmp_path):
    """A meta that claims content whose shard files are gone reports
    ok=False instead of crashing (the lost-rewrite case); a missing
    meta likewise."""
    import glob
    import shutil

    out = str(tmp_path / "lost")
    tsh.write_tokenized_shards(
        _docs(spark, [(0, "aa bb cc dd")]), out, seq_len=4,
        vocab={"aa": 2, " bb": 3, " cc": 4, " dd": 5},
    )
    for d in glob.glob(out + "/shard_id=*"):
        shutil.rmtree(d)
    rep = tsh.verify_shards(spark, out)
    assert not rep["ok"] and "error" in rep

    rep = tsh.verify_shards(spark, str(tmp_path / "never_existed"))
    assert not rep["ok"] and "error" in rep


def test_shards_with_learned_merges_roundtrip(spark, tmp_path):
    """Shards written under a LEARNED BPE merge table: the decoded id
    stream equals the pure-Python pipeline (apply_merges_py per word,
    flattened in doc order, mapped through the pinned vocab), and the
    merge table is recorded in the tokenizer meta."""
    import numpy as np

    from ong_tsdb_spark.plans import bpe

    rows = [(i, "the theatre then other ether " * (i % 3 + 1)) for i in range(8)]
    df = _docs(spark, rows)
    merges = bpe.train_bpe_merges(df, n_merges=6)
    assert merges  # the fixture corpus must actually learn something

    # pinned vocab over the SUBWORD stream, built with the Python twin
    cnt: dict[str, int] = {}
    streams = {}
    for i, t in rows:
        toks = [s for w in t.split(" ") if w for s in bpe.apply_merges_py(w, merges)]
        streams[i] = toks
        for tok in toks:
            cnt[tok] = cnt.get(tok, 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    vmap = {t: tsh.FIRST_ID + i for i, (t, _) in enumerate(ranked)}

    out = str(tmp_path / "m")
    tsh.write_tokenized_shards(
        df, out, seq_len=16, bins_per_shard=4, vocab=vmap, merges=merges
    )
    assert tsh.read_tokenizer_meta(out)["merges"] == [list(m) for m in merges]

    got = []
    for _, ids, n_real in tsh.iter_training_sequences(out):
        got.extend(int(x) for x in np.asarray(ids)[:n_real])
    want = [
        vmap.get(tok, tsh.UNK_ID)
        for i in sorted(streams)
        for tok in streams[i]
    ]
    assert got == want


def test_append_equals_oneshot_with_merges(spark, tmp_path):
    """The append equivalence contract holds under a merge table: the
    appended batch re-tokenizes with the RECORDED merges (nothing is
    passed to append), yielding byte-identical shards to the one-shot
    write."""
    from ong_tsdb_spark.plans import bpe

    a = [(i, "the theatre then thens " * (i % 3 + 1)) for i in range(12)]
    b = [(i, "other ether tether the " * (i % 2 + 1)) for i in range(12, 20)]
    dfa, dfb, dfall = _docs(spark, a), _docs(spark, b), _docs(spark, a + b)
    merges = bpe.train_bpe_merges(dfall, n_merges=5)
    vocab = tsh.vocab_table(dfall, vocab_size=30,
                            tokens_fn=tsh._merges_tokens_fn(merges))
    vmap = {r["token"]: r["id"] for r in vocab.collect()}

    one, inc = str(tmp_path / "one"), str(tmp_path / "inc")
    kw = dict(seq_len=16, bins_per_shard=4, vocab=vmap, merges=merges)
    tsh.write_tokenized_shards(dfall, one, **kw)
    tsh.write_tokenized_shards(dfa, inc, **kw)
    assert tsh.append_tokenized_shards(dfb, inc) >= 1
    assert _read_all(spark, inc) == _read_all(spark, one)
    m_inc, m_one = tsh.read_tokenizer_meta(inc), tsh.read_tokenizer_meta(one)
    assert m_inc["total_tokens"] == m_one["total_tokens"]
    assert m_inc["merges"] == m_one["merges"] == [list(m) for m in merges]


def test_epoch_pack_stats_full_pipeline_model(spark):
    """The training-epoch-on-disk loop (VERDICT r7 #8) against a
    pure-Python twin of the WHOLE pipeline: mix quotas (binding-source
    integer math), md5 hash ranking per source, the canonical
    round-robin interleave (keep_rank asc, source asc), tokenize,
    vocab rank, concat-and-split packing — plus the packing
    invariants (every sequence but the last exactly seq_len real
    tokens, contiguous seq_ids, checksums order-sensitive)."""
    import hashlib

    docs = []
    did = 0
    for s, n in (("sa", 8), ("sb", 4), ("sc", 6)):
        for _ in range(n):
            did += 1
            docs.append((did, s, f"doc {did} w{did % 3}! ab{did % 2}"))
    tgt = {"sa": 500_000, "sb": 250_000, "sc": 250_000}
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    seq_len, vocab = 7, 10

    got = {
        r["seq_id"]: r
        for r in tsh.epoch_pack_stats(
            df, target_ppm=tgt, vocab_size=vocab, seq_len=seq_len
        ).collect()
    }

    # ---- python model ----
    ns = {"sa": 8, "sb": 4, "sc": 6}
    star = min(tgt, key=lambda s: (ns[s] / tgt[s], s))
    keep = {s: (tgt[s] * ns[star]) // tgt[star] for s in tgt}
    assert keep == {"sa": 8, "sb": 4, "sc": 4}  # sc downsampled

    def h(doc_id):
        return hashlib.md5(f"mix|{doc_id}".encode()).hexdigest()

    by_src: dict[str, list] = {}
    for d, s, text in docs:
        by_src.setdefault(s, []).append((h(d), d, text))
    kept = {}
    for s, lst in by_src.items():
        lst.sort()
        for r, (_, d, text) in enumerate(lst[: keep[s]], start=1):
            kept[(r, s)] = text
    texts = [kept[k] for k in sorted(kept)]  # round-robin epoch order
    want = _model_pack(texts, vocab, seq_len)

    assert set(got) == set(want)
    for b in want:
        real = want[b]["ids"]
        ck = sum((p + 1) * x for p, x in enumerate(real))
        assert got[b]["n_real_tokens"] == want[b]["n_real"], b
        assert got[b]["n_docs"] == want[b]["n_docs"], b
        assert got[b]["ids_checksum"] == ck, b
    # packing invariants
    mx = max(got)
    assert set(got) == set(range(mx + 1))
    for b, r in got.items():
        if b != mx:
            assert r["n_real_tokens"] == seq_len, b
    assert len(ns) < tsh.EPOCH_KEY_STRIDE


def test_shuffled_shard_layout_is_exact_global_hash_rank(spark):
    """shuffled_shard_layout: shuffle_rank is exactly the 1..N global
    md5-order rank (bucketed two-level rank == single global sort,
    verified against a driver-side model), shards are size-balanced
    (every shard full except the last), and a different salt yields a
    different permutation of the SAME rank set."""
    import hashlib

    n = 100
    seqs = spark.createDataFrame(
        [(i, i * 10) for i in range(n)], "seq_id long, payload long"
    )
    out = tsh.shuffled_shard_layout(
        seqs, bins_per_shard=16, n_buckets=8
    ).collect()

    def h(salt, i):
        return hashlib.md5(f"{salt}|{i}".encode()).hexdigest()

    want_order = sorted(range(n), key=lambda i: (h("shuffle", i), i))
    want_rank = {i: r + 1 for r, i in enumerate(want_order)}
    got_rank = {r["seq_id"]: r["shuffle_rank"] for r in out}
    assert got_rank == want_rank
    # payload columns ride along untouched
    assert all(r["payload"] == r["seq_id"] * 10 for r in out)
    # shard balance: every shard exactly 16 sequences, last gets 100%16
    from collections import Counter

    sizes = Counter(r["shard_id"] for r in out)
    assert sizes == {0: 16, 1: 16, 2: 16, 3: 16, 4: 16, 5: 16, 6: 4}
    # independent permutation per salt
    out2 = {
        r["seq_id"]: r["shuffle_rank"]
        for r in tsh.shuffled_shard_layout(
            seqs, bins_per_shard=16, n_buckets=8, salt="epoch2"
        ).collect()
    }
    assert sorted(out2.values()) == list(range(1, n + 1))
    assert out2 != got_rank


def test_epoch_pack_stats_rejects_stride_many_sources(spark):
    """EPOCH_KEY_STRIDE runtime guard (VERDICT r8 #2 / ADVICE): with
    MORE than 1024 distinct sources the source index reaches the
    stride and aliases the next keep-rank's index 0 — the packed epoch
    keys collide and silently corrupt the epoch order — so
    epoch_pack_stats must refuse before the packing runs: a production
    caller with a pathological source column gets a ValueError, not a
    wrong epoch.  Exactly 1024 sources is collision-free (indexes span
    0..1023) and must still work."""
    import pytest as _pytest

    n = tsh.EPOCH_KEY_STRIDE + 1  # the first colliding count
    docs = spark.createDataFrame(
        [(i, f"src{i:04d}", "hello world") for i in range(n)],
        "doc_id long, source string, text string",
    )
    # uniform target mix so every one of the n sources keeps its doc
    ppm = {f"src{i:04d}": 1_000_000 // n for i in range(n)}
    with _pytest.raises(ValueError, match="sources"):
        tsh.epoch_pack_stats(docs, target_ppm=ppm, vocab_size=64, seq_len=16)

    # boundary: exactly STRIDE sources packs fine (off-by-one guard)
    m = tsh.EPOCH_KEY_STRIDE
    docs_ok = spark.createDataFrame(
        [(i, f"src{i:04d}", "hello world") for i in range(m)],
        "doc_id long, source string, text string",
    )
    ppm_ok = {f"src{i:04d}": 1_000_000 // m for i in range(m)}
    rows = tsh.epoch_pack_stats(
        docs_ok, target_ppm=ppm_ok, vocab_size=64, seq_len=16
    ).collect()
    assert rows and all(r["n_docs"] >= 1 for r in rows)


def test_shuffled_shards_byte_roundtrip(spark, tmp_path):
    """VERDICT r8 #4: write a SHUFFLED epoch through the shard writer
    and byte-verify the blobs in shuffle order — the full composition
    shuffled_shard_layout -> blob writer -> verify_shards ->
    iter_training_sequences, asserting CONTENT equality in
    shuffle_rank order, plus re-salting giving a different permutation
    of the same blob multiset and the append-refusal contract."""
    docs = _docs(
        spark,
        [(i, f"tok{i % 7} alpha beta tok{i % 5} gamma " * 3) for i in range(40)],
    )
    seq_len, bps = 16, 4
    vocab = {t: tsh.FIRST_ID + i for i, t in enumerate(
        sorted({f" tok{k}" for k in range(7)} | {f"tok{k}" for k in range(7)}
               | {" alpha", " beta", " gamma", "alpha"})
    )}
    # expected: corpus-order packing permuted by the layout's rank
    seqs = tsh.pack_sequences(docs, seq_len=seq_len, vocab=vocab)
    layout = tsh.shuffled_shard_layout(
        seqs, bins_per_shard=bps, salt="epoch1"
    ).collect()
    by_rank = sorted(layout, key=lambda r: r["shuffle_rank"])
    expected = [
        (np.asarray(r["ids"], dtype="<u2"), int(r["n_real_tokens"]))
        for r in by_rank
    ]
    assert [r["seq_id"] for r in by_rank] != sorted(
        r["seq_id"] for r in by_rank
    ), "permutation degenerate — pick different salt/corpus"

    out = str(tmp_path / "shuffled")
    n_sh = tsh.write_shuffled_shards(
        docs, out, seq_len=seq_len, bins_per_shard=bps,
        vocab=vocab, salt="epoch1",
    )
    assert n_sh == (len(expected) + bps - 1) // bps
    rep = tsh.verify_shards(spark, out)
    assert rep["ok"], rep
    got = list(tsh.iter_training_sequences(out))
    assert [sid for sid, _, _ in got] == list(range(len(expected)))
    for (sid, ids, nr), (eids, enr) in zip(got, expected):
        assert nr == enr, sid
        assert np.array_equal(ids, eids), f"blob content mismatch at rank {sid}"

    # a different salt: same blob multiset, different order
    out2 = str(tmp_path / "shuffled2")
    tsh.write_shuffled_shards(
        docs, out2, seq_len=seq_len, bins_per_shard=bps,
        vocab=vocab, salt="epoch2",
    )
    got2 = list(tsh.iter_training_sequences(out2))
    assert sorted(x.tobytes() for _, x, _ in got) == sorted(
        x.tobytes() for _, x, _ in got2
    )
    assert [x.tobytes() for _, x, _ in got] != [x.tobytes() for _, x, _ in got2]

    # one-shot artifact: appends must refuse
    with pytest.raises(ValueError, match="SHUFFLED"):
        tsh.append_tokenized_shards(
            _docs(spark, [(100, "alpha beta")]), out
        )


def test_write_shuffled_shards_empty_corpus(spark, tmp_path):
    """Code-review r9: an empty corpus must produce a valid zero-row
    shuffled directory (verify_shards ok, appends still refused) when a
    vocab is pinned, and a clear error when one is not — never a
    half-committed directory with sidecars missing."""
    empty = _docs(spark, []).filter("doc_id IS NOT NULL").limit(0)
    out = str(tmp_path / "empty_shuf")
    with pytest.raises(ValueError, match="empty corpus"):
        tsh.write_shuffled_shards(empty, out, seq_len=8)
    vocab = {"a": tsh.FIRST_ID}
    n = tsh.write_shuffled_shards(empty, out, seq_len=8, vocab=vocab)
    assert n == 0
    rep = tsh.verify_shards(spark, out)
    assert rep["ok"] and rep["n_sequences"] == 0, rep
    assert tsh.read_tokenizer_meta(out)["shuffled"]["salt"] == "shuffle"
    with pytest.raises(ValueError, match="SHUFFLED"):
        tsh.append_tokenized_shards(
            _docs(spark, [(1, "a")]), out
        )
