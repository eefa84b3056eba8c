"""Skewed-corpus oracle gate: the sf tables are UNIFORM (sources,
users, texts, vectors and join keys all near-evenly distributed), so
the driver's correctness rows never exercise hot-key shapes — yet at
100 TB one source owning half the corpus, one bot user owning half
the event stream, or 25% boilerplate-duplicate text is the NORM, and
any top-k whose tie-break is unpinned goes nondeterministic the
moment half the vectors are identical.

This module rebuilds the tools/skew_corpus.py corpus in a tmp dir and
re-runs a representative subset of skew-facing registry entries
against their DuckDB oracles on it — one entry per hot-key shape.
The full sweep is ``python tools/replay.py --sf-dir /tmp/skew_sf``
per the skew_corpus docstring, part of round close.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from ong_tsdb_spark.compare import TABLES, canon_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one entry per hot-key shape the skew rewrite creates:
#   hot md5 digest (25% one text)            -> dedup_exact
#   hot MinHash band bucket                  -> dedup_minhash_lsh
#   hot shingle inverted-index key           -> dedup_ngram_jaccard
#   giant duplicate cluster (CC)             -> dedup_clusters
#   giant semantic cluster (bounded quad)    -> dedup_semantic
#   massive cosine ties (50% one vector)     -> emb_ann_recall (brute inside)
#   hot IVF cell                             -> emb_ivf_recall (IVF inside)
#   hot source mass (50% one source)         -> corpus_epoch_mix
#   hot classifier bucket                    -> corpus_mix_weights
#   giant per-user window partition          -> ts_sessionize
#   hot as-of join series                    -> ts_asof_join
#   hot orders join key (50% one orderkey) -> tpch_q3_topk
SKEW_ENTRIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_semantic",
    # r11 retirements: the recall gauges run the same brute / IVF
    # kernels (plus the recall join) — the tie/hot-cell skew scenarios
    # still execute the retired plans inside the survivors
    "emb_ann_recall",
    "emb_ivf_recall",
    "corpus_epoch_mix",
    "corpus_mix_weights",
    "ts_sessionize",
    "ts_asof_join",
    "tpch_q3_topk",
]


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "skew_corpus_mod", os.path.join(REPO, "tools", "skew_corpus.py")
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    return sc


@pytest.fixture(scope="module")
def skew_sf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skew_sf"))
    _load_tool().build("/root/testdata/sf0.001", out)
    return out


@pytest.fixture(scope="module")
def skew_duck(skew_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{skew_sf}/{t}.parquet'")
    return con


def test_skew_shapes(skew_sf):
    """The generator must actually produce the documented hot masses
    and keep derived columns consistent (n_chars == len(text))."""
    import pyarrow.parquet as pq

    sc = _load_tool()
    d = pq.read_table(os.path.join(skew_sf, "documents.parquet"))
    texts = d["text"].to_pylist()
    srcs = d["source"].to_pylist()
    nch = d["n_chars"].to_pylist()
    n = len(texts)
    assert srcs.count(sc.HOT_SOURCE) * 2 >= n - 2
    assert texts.count(sc.HOT_TEXT) * 4 >= n - 4
    for t, c in zip(texts, nch):
        if t is not None and c is not None:
            assert c == len(t)
    ev = pq.read_table(os.path.join(skew_sf, "events.parquet"))
    users = ev["user_id"].to_pylist()
    assert users.count(sc.HOT_USER) * 2 >= ev.num_rows - 2
    vec = sc.hot_vector(64)
    assert abs(sum(x * x for x in vec) - 1.0) < 1e-9
    assert vec == sc.hot_vector(64)  # deterministic


@pytest.mark.parametrize("name", SKEW_ENTRIES)
def test_skew_entry_vs_oracle(spark, skew_sf, skew_duck, name):
    sdf = entry_mod.queries()[name](spark, skew_sf)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    res = skew_duck.sql(entry_mod.oracle_sql()[name])
    dcols = list(res.columns)
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    sc = canon_rows(scols, srows)
    dc = canon_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"
