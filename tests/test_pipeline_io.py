"""Pipeline I/O edges: the JSONL corpus source/sink and the packed
training-shard writer."""

from __future__ import annotations

from pyspark.sql import functions as F

from ong_tsdb_spark.plans.shards import SHARD_COL, write_packed_shards
from ong_tsdb_spark.sources.jsonl import (
    CORRUPT_COL,
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "corpus_jsonl")
    write_documents_jsonl(docs, path, shards=3)
    back = read_documents_jsonl(spark, path)
    assert [f.name for f in back.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    want = sorted(tuple(r) for r in docs.select(*back.columns).collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "shard.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    clean = read_documents_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert CORRUPT_COL not in clean.columns

    # Spark disallows queries touching ONLY the corrupt column — a
    # quarantine sink always projects a data column alongside it
    quarantine = (
        read_documents_jsonl(spark, str(p), keep_corrupt=True)
        .select("doc_id", CORRUPT_COL)
        .filter(F.col(CORRUPT_COL).isNotNull())
        .collect()
    )
    assert len(quarantine) == 1
    assert "not json" in quarantine[0][CORRUPT_COL]


def test_packed_shards_layout(spark, sf_dir, tmp_path):
    from ong_tsdb_spark.operators.text import sequence_pack_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    n_shards = write_packed_shards(
        docs, out, seq_len=128, bins_per_shard=4
    )
    back = spark.read.parquet(out)

    # every document exactly once, none lost at shard boundaries
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # shard assignment is exactly the packing layout's first-token bin
    layout = {
        r["doc_id"]: r["bin_id"]
        for r in sequence_pack_stats(docs, seq_len=128).collect()
    }
    for r in back.select("doc_id", "bin_id", SHARD_COL).collect():
        assert r["bin_id"] == layout[r["doc_id"]]
        assert r[SHARD_COL] == r["bin_id"] // 4
    assert back.select(SHARD_COL).distinct().count() == n_shards
    # token balance: every shard but the last carries >= its bin
    # capacity's worth of starts (first-token rule; spillover belongs
    # to the next shard's read path)
    tok = back.groupBy(SHARD_COL).agg(F.sum("n_tok").alias("t")).collect()
    assert len(tok) == n_shards
