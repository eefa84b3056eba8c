"""Adversarial-corpus oracle gate: the sf tables are CLEAN (no empty
or NULL text, no zero/NULL/huge vectors), so the driver's correctness
rows never exercise the edge paths that kill 100-TB jobs — the r9
edge-corpus replay found four latent fault classes this way (ANSI
divide-by-zero, bigint overflow on a 1e30 element, np.array over a
None vector, NULL-key semantics drifting between Spark and DuckDB).

This module rebuilds the tools/edge_corpus.py corpus in a tmp dir and
re-runs a representative subset of the corpus-facing registry entries
against their DuckDB oracles on it — one entry per fault family, kept
fast (the full 66-entry sweep is the tools/replay.py command in the
edge_corpus docstring, part of round close).
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from ong_tsdb_spark.compare import TABLES, canon_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one entry per fault family the adversarial block reaches:
#   exact-integer chain (overflow / eligibility)  -> emb_centroid_dist
#   PQ full-vector eligibility                    -> emb_pq_adc_topk
#   BLAS pair matmul (None vectors, zero norm)    -> emb_neardup_blocked
#   semantic routing (keep verdict for dirty)     -> dedup_semantic
#   streaming ledger '' convention                -> dedup_ledger_backfill
#   NULL-text scoring (filter verdict exists)     -> text_c4_quality
#   empty-signature convention                    -> text_rolling_fingerprint
#   zero-token doc packing membership             -> corpus_pack_sequences
#   NULL payload = empty payload                  -> multimodal_features
#   events block (NULL ts/user/type, NaN value, malformed JSON):
#   valid-ticks contract                          -> ts_snap_grid
#   NULL-key rows through the chunked prefix sum  -> ts_cumulative_sum_chunked
#   NULL series through the gap-fill grid joins   -> ts_gap_fill_linear
#   shape-shifted / malformed / empty JSON        -> events_json_extract
#   NULL-user cohort identity                     -> events_retention
#   malformed-line-tolerant parser + writer gate  -> influx_roundtrip
EDGE_ENTRIES = [
    "emb_centroid_dist",
    "emb_pq_adc_topk",
    "emb_neardup_blocked",
    "dedup_semantic",
    "dedup_ledger_backfill",
    "text_c4_quality",
    "text_rolling_fingerprint",
    "corpus_pack_sequences",
    "multimodal_features",
    "ts_snap_grid",
    "ts_cumulative_sum_chunked",
    # ts_gap_fill retired r11: the NULL-series grid-join scenario rides
    # the surviving linear twin (same grid explode + carry windows)
    "ts_gap_fill_linear",
    "events_json_extract",
    "events_retention",
    "influx_roundtrip",
]


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    spec = importlib.util.spec_from_file_location(
        "edge_corpus_mod", os.path.join(REPO, "tools", "edge_corpus.py")
    )
    ec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ec)
    out = str(tmp_path_factory.mktemp("edge_sf"))
    ec.build("/root/testdata/sf0.001", out)
    return out


@pytest.fixture(scope="module")
def edge_duck(edge_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{edge_sf}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", EDGE_ENTRIES)
def test_edge_entry_vs_oracle(spark, edge_sf, edge_duck, name):
    sdf = entry_mod.queries()[name](spark, edge_sf)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    res = edge_duck.sql(entry_mod.oracle_sql()[name])
    dcols = list(res.columns)
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    sc = canon_rows(scols, srows)
    dc = canon_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


def test_hostile_session_size_of_null_pinned(spark, edge_sf, edge_duck):
    """Data x session hostility (code-review r9): with ANSI disabled
    Spark flips legacy sizeOfNull back on, so size(split(NULL)) is
    silently -1 — 12 text entries diverged from their oracles on the
    NULL-text row.  entry_queries.load() pins sizeOfNull=false like
    nanosAsLong; this replays one such entry under the hostile confs
    and requires oracle equality."""
    saved = {
        "spark.sql.ansi.enabled": spark.conf.get("spark.sql.ansi.enabled"),
        "spark.sql.legacy.sizeOfNull": spark.conf.get(
            "spark.sql.legacy.sizeOfNull", "false"
        ),
    }
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
        sdf = entry_mod.queries()["text_tokens"](spark, edge_sf)
        srows = [tuple(r) for r in sdf.collect()]
        res = edge_duck.sql(entry_mod.oracle_sql()["text_tokens"])
        assert canon_rows(list(sdf.columns), srows) == canon_rows(
            list(res.columns), res.fetchall()
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_quantize_eligibility_bounds(spark):
    """ivf_quantize_expr is the exact family's choke point: NaN, ±Inf
    and |x| > EXACT_MAX_ABS elements must quantize to NULL (routing
    the row around the bigint chain), in both the Catalyst expr and
    the driver-side twin."""
    from pyspark.sql import functions as F

    from ong_tsdb_spark.operators.similarity import (
        EXACT_MAX_ABS,
        IVF_QUANT_SCALE,
        ivf_quantize_expr,
        ivf_quantize_py,
    )

    vec = [1.0, -1.0, float(EXACT_MAX_ABS), float(EXACT_MAX_ABS) + 1.0,
           1.0e30, float("nan"), float("inf"), float("-inf")]
    df = spark.createDataFrame([(vec,)], "v array<double>")
    got = df.select(ivf_quantize_expr(F.col("v")).alias("q")).first()["q"]
    expect = [
        IVF_QUANT_SCALE, -IVF_QUANT_SCALE,
        EXACT_MAX_ABS * IVF_QUANT_SCALE, None, None, None, None, None,
    ]
    assert list(got) == expect
    assert ivf_quantize_py(vec) == expect
    # products through the sqdist fold stay under 2^63 by the bound
    worst = (2 * EXACT_MAX_ABS * IVF_QUANT_SCALE) ** 2 * 64
    assert worst < 2 ** 63


def test_null_source_excluded_from_epoch_mix(spark, edge_sf, edge_duck):
    """NULL-SOURCE CONTRACT (VERDICT r9 #4): a document with a NULL
    source belongs to no mixture component and must be absent from the
    epoch materialization under BOTH engines — structurally (the
    explicit filter at the head of epoch_mix_sample), not as equi-join
    fallout.  The edge corpus carries exactly one such row (doc_id
    900010, tools/edge_corpus.py)."""
    # the NULL-source edge doc exists in the corpus
    n = edge_duck.sql(
        f"SELECT count(*) FROM '{edge_sf}/documents.parquet' "
        "WHERE source IS NULL"
    ).fetchone()[0]
    assert n == 1, "edge corpus must carry the NULL-source row"

    sdf = entry_mod.queries()["corpus_epoch_mix"](spark, edge_sf)
    assert "doc_id" in sdf.columns and "source" in sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    di = scols.index("doc_id")
    si = scols.index("source")
    assert all(r[di] != 900010 for r in srows), "NULL-source doc leaked (Spark)"
    assert all(r[si] is not None for r in srows)

    res = edge_duck.sql(entry_mod.oracle_sql()["corpus_epoch_mix"])
    dcols = list(res.columns)
    drows = res.fetchall()
    ddi = dcols.index("doc_id")
    assert all(r[ddi] != 900010 for r in drows), "NULL-source doc leaked (oracle)"
    # and the full outputs still agree
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)
