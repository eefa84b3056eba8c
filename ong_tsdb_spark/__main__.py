"""CLI — the reference's maintenance surface (``python -m ong_tsdb``
verify/repair/migrate, reference src/ong_tsdb/__main__.py:96-254)
re-expressed for the Spark engine:

    python -m ong_tsdb_spark verify  --base DIR [--db DB] [--sensor S]
    python -m ong_tsdb_spark compact --base DIR --db DB --sensor S
                                     [--codec zstd] [--keep-recent N]
    python -m ong_tsdb_spark rollup  --base DIR --db DB --sensor S
                                     --dst S_1h --freq 1h [--agg avg]
    python -m ong_tsdb_spark stats   --base DIR
    python -m ong_tsdb_spark retention --base DIR --db DB --sensor S
                                       --older-than-ts EPOCH_S
    python -m ong_tsdb_spark serve   --base DIR [--host H] [--port P]
                                     [--admin-key K]
    python -m ong_tsdb_spark curate  --src DROPDIR --ledger DIR
                                     --clean DIR --checkpoint DIR
                                     --shards DIR [--seq-len N]
                                     [--vocab-size V] [--bins-per-shard B]

(repair has no Spark analog — Parquet footers make truncation
detection native; compact rewrites salvage what a rewrite can.)
"""

from __future__ import annotations

import argparse
import sys


def _engine(base: str):
    from pyspark.sql import SparkSession

    from .engine import OngTsdbSpark

    spark = (
        SparkSession.builder.appName("ong_tsdb_spark-cli")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    return OngTsdbSpark(spark, base)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ong_tsdb_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("verify", help="X1: per-sensor integrity + usage stats")
    pv.add_argument("--base", required=True)
    pv.add_argument("--db")
    pv.add_argument("--sensor")

    pc = sub.add_parser("compact", help="X3/X4: rewrite cold partitions with a codec")
    pc.add_argument("--base", required=True)
    pc.add_argument("--db", required=True)
    pc.add_argument("--sensor", required=True)
    pc.add_argument("--codec", default="zstd")
    pc.add_argument("--keep-recent", type=int, default=0)

    pr = sub.add_parser("rollup", help="materialize a downsampled sensor")
    pr.add_argument("--base", required=True)
    pr.add_argument("--db", required=True)
    pr.add_argument("--sensor", required=True)
    pr.add_argument("--dst", required=True)
    pr.add_argument("--freq", required=True)
    pr.add_argument("--agg", default="avg")

    ps = sub.add_parser("stats", help="catalog overview")
    ps.add_argument("--base", required=True)

    pt = sub.add_parser("retention", help="X4: drop chunk partitions older than a cutoff")
    pt.add_argument("--base", required=True)
    pt.add_argument("--db", required=True)
    pt.add_argument("--sensor", required=True)
    pt.add_argument("--older-than-ts", type=float, required=True,
                    help="epoch seconds; partitions strictly older are dropped")

    pw = sub.add_parser("serve", help="run the HTTP façade (reference server surface)")
    pw.add_argument("--base", required=True)
    pw.add_argument("--host", default="127.0.0.1")
    pw.add_argument("--port", type=int, default=5000)
    pw.add_argument("--admin-key", default=None)

    pu = sub.add_parser(
        "curate",
        help="drain a JSONL drop dir through gate -> scrub -> ledger "
        "dedup -> pre-tokenized training shards (AvailableNow: "
        "process the backlog, then exit — cron-able)",
    )
    pu.add_argument("--src", required=True, help="JSONL drop directory")
    pu.add_argument("--ledger", required=True, help="digest ledger directory")
    pu.add_argument("--clean", required=True, help="clean-corpus output directory")
    pu.add_argument("--checkpoint", required=True, help="stream checkpoint directory")
    pu.add_argument("--shards", required=True, help="tokenized shard directory")
    pu.add_argument("--seq-len", type=int, default=4096)
    pu.add_argument("--vocab-size", type=int, default=65_000)
    pu.add_argument("--bins-per-shard", type=int, default=2048)
    pu.add_argument(
        "--vocab-file",
        default=None,
        help="pre-trained vocabulary JSON: either an id-ordered token "
        "list or a token->id map.  Strongly recommended for "
        "production — without it the vocabulary is trained on "
        "whatever the FIRST micro-batch contains and pinned forever",
    )
    pu.add_argument(
        "--gate",
        default="gopher",
        choices=["gopher", "classifier", "gopher+classifier"],
        help="quality gate for incoming documents (streaming/corpus."
        "gate_expr): rule-based Gopher filters, the hashed linear "
        "classifier, or their conjunction",
    )
    pu.add_argument(
        "--merges-file",
        default=None,
        help="learned BPE merge table JSON ([[a, b], ...], the "
        "plans/bpe.train_bpe_merges output) — switches shard "
        "tokenization to the trained subword tokenizer; recorded in "
        "the shard meta so later appends tokenize identically",
    )

    pvs = sub.add_parser(
        "verify-shards",
        help="X1-style integrity check for a tokenized shard directory",
    )
    pvs.add_argument("--shards", required=True)

    pai = sub.add_parser(
        "build-ann-index",
        help="train + persist an ANN index over an embedding parquet "
        "(ivf: cluster-partitioned rows; pq: codes-only table)",
    )
    pai.add_argument("--src", required=True, help="parquet with (vec_id, embedding)")
    pai.add_argument("--dst", required=True, help="index output directory")
    pai.add_argument("--kind", default="ivf", choices=["ivf", "pq", "ivfpq"])
    pai.add_argument("--k", type=int, default=8, help="clusters (ivf) / codes per subspace (pq)")
    pai.add_argument("--m", type=int, default=4, help="pq subspaces")
    pai.add_argument("--iters", type=int, default=2)
    pai.add_argument("--vec-col", default="embedding")
    pai.add_argument("--id-col", default="vec_id")

    args = p.parse_args(argv)
    if args.cmd == "build-ann-index":
        from pyspark.sql import SparkSession

        from .operators import similarity

        spark = (
            SparkSession.builder.appName("ong_tsdb_spark-build-ann-index")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        df = spark.read.parquet(args.src)
        if args.kind == "ivfpq":
            cents = similarity.train_ivf_centroids_exact(
                df, k=args.k, iters=args.iters,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            books = similarity.train_pq_codebooks_exact(
                df, m=args.m, k=args.k, iters=args.iters,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            similarity.write_ivfpq_index(
                df, cents, books, args.dst,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            print(
                f"ivfpq index at {args.dst}: k={args.k} m={args.m} "
                f"(cluster-partitioned codes-only table + meta sidecar)"
            )
            return 0
        if args.kind == "pq":
            books = similarity.train_pq_codebooks_exact(
                df, m=args.m, k=args.k, iters=args.iters,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            similarity.write_pq_index(
                df, books, args.dst, vec_col=args.vec_col, id_col=args.id_col
            )
            print(
                f"pq index at {args.dst}: m={args.m} k={args.k} "
                f"(codes-only table + codebook sidecar)"
            )
        else:
            cents = similarity.train_ivf_centroids(
                df, k=args.k, iters=args.iters,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            similarity.write_ivf_index(df, cents, args.dst, vec_col=args.vec_col)
            print(
                f"ivf index at {args.dst}: k={args.k} "
                f"(ivf_cluster-partitioned rows + centroid sidecar)"
            )
        return 0

    if args.cmd == "verify-shards":
        from pyspark.sql import SparkSession

        from .plans.tokenized_shards import verify_shards

        spark = (
            SparkSession.builder.appName("ong_tsdb_spark-verify-shards")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        rep = verify_shards(spark, args.shards)
        for k, v in rep.items():
            print(f"{k}={v}")
        return 0 if rep["ok"] else 1

    if args.cmd == "curate":
        from pyspark.sql import SparkSession

        from .plans.tokenized_shards import read_tokenizer_meta
        from .streaming.corpus import start_corpus_to_shards

        spark = (
            SparkSession.builder.appName("ong_tsdb_spark-curate")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        vocab = None
        if args.vocab_file:
            import json as _json

            from .plans.tokenized_shards import FIRST_ID

            with open(args.vocab_file) as f:
                raw = _json.load(f)
            vocab = (
                {t: FIRST_ID + i for i, t in enumerate(raw)}
                if isinstance(raw, list)
                else {t: int(i) for t, i in raw.items()}
            )
        merges = None
        if args.merges_file:
            import json as _json

            with open(args.merges_file) as f:
                merges = [(str(a), str(b)) for a, b in _json.load(f)]
        q = start_corpus_to_shards(
            spark,
            args.src,
            ledger_path=args.ledger,
            out_path=args.clean,
            checkpoint_path=args.checkpoint,
            shards_path=args.shards,
            vocab=vocab,
            vocab_size=args.vocab_size,
            seq_len=args.seq_len,
            bins_per_shard=args.bins_per_shard,
            quality_gate=args.gate,
            merges=merges,
        )
        q.awaitTermination()
        try:
            meta = read_tokenizer_meta(args.shards)
            print(
                f"shards at {args.shards}: total_tokens={meta['total_tokens']} "
                f"last_doc_id={meta['last_doc_id']} seq_len={meta['seq_len']}"
            )
        except FileNotFoundError:
            print("no documents survived curation yet; shard dir not bootstrapped")
        return 0
    if args.cmd == "serve":
        from pyspark.sql import SparkSession

        from .engine import OngTsdbSpark
        from .service.server import create_app

        spark = (
            SparkSession.builder.appName("ong_tsdb_spark-serve")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        eng = OngTsdbSpark(spark, args.base, admin_key=args.admin_key)
        create_app(eng).run(host=args.host, port=args.port)
        return 0

    eng = _engine(args.base)

    if args.cmd == "verify":
        from .plans.maintenance import verify_all, verify_sensor

        if args.db and args.sensor:
            stats = [verify_sensor(eng, args.db, args.sensor)]
        else:
            stats = verify_all(eng)
        bad = 0
        for s in stats:
            flag = ""
            if s.duplicate_ts or s.off_grid:
                flag = "  <-- CORRUPT"
                bad += 1
            print(
                f"{s.db}.{s.sensor}: {s.n_rows} rows, {s.n_chunks} chunks, "
                f"ts [{s.min_ts}, {s.max_ts}], dup={s.duplicate_ts}, "
                f"off_grid={s.off_grid}{flag}"
            )
        return 1 if bad else 0

    if args.cmd == "compact":
        from .plans.maintenance import compact_sensor

        n = compact_sensor(
            eng, args.db, args.sensor, codec=args.codec, keep_recent_chunks=args.keep_recent
        )
        print(f"rewrote {n} partitions of {args.db}.{args.sensor} with {args.codec}")
        return 0

    if args.cmd == "rollup":
        from .plans.rollup import rollup_sensor

        rollup_sensor(eng, args.db, args.sensor, args.dst, freq=args.freq, agg=args.agg)
        print(f"materialized {args.db}.{args.dst} = {args.agg}({args.sensor}) @ {args.freq}")
        return 0

    if args.cmd == "stats":
        for db in eng.catalog.get_dbs():
            for sensor in eng.catalog.get_sensors(db):
                cfg = eng.catalog.get_config(db, sensor)
                print(f"{db}.{sensor}: freq={cfg.freq} metrics={cfg.metrics}")
        return 0

    if args.cmd == "retention":
        from .plans.maintenance import apply_retention

        n = apply_retention(eng, args.db, args.sensor, older_than_ts=args.older_than_ts)
        print(f"dropped {n} partitions of {args.db}.{args.sensor}")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
