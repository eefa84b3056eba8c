#!/usr/bin/env python
"""Build an ADVERSARIAL scale-factor directory for robustness replays.

The driver's synthetic corpus is clean: no empty documents, no NULL
text/lang/source, no zero or NULL embedding vectors.  Every operator
that divides by a token count, indexes an array by a computed code, or
feeds vectors to BLAS therefore rides on data that never exercises its
edge paths — the r9 review found four such latent faults (ANSI
divide-by-zero on a zero-norm vector, element_at on a NULL pq code,
float(None) in the IVF trainer, int32 overflow in passage keys) that
sf-corpus replays could never catch.

This tool clones a base sf dir and appends a fixed adversarial block
to ``documents`` and ``embeddings`` (ids >= 900001, source='edge'):
empty / whitespace-only / NULL text, NULL lang and source, pure
punctuation, a single 2000-char token, extreme repetition, quotes and
control characters, plus zero / NULL / null-element / huge-magnitude
vectors and a NULL label.  The other eight tables are copied verbatim
so every registry entry still runs.

    python tools/edge_corpus.py [--base /root/testdata/sf0.001]
                                [--out /tmp/edge_sf] [--list-corpus]

    # then replay the corpus-facing entries against their oracles:
    python tools/replay.py --sf-dir /tmp/edge_sf \
        --only $(python tools/edge_corpus.py --list-corpus)

``--list-corpus`` prints the registry entries whose oracle SQL touches
``documents`` or ``embeddings`` — the entries the adversarial block
can reach.  Exit code of the replay is the robustness verdict: Spark
and DuckDB must agree on the edge rows, not merely survive them.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64  # embedding width in every driver sf dir

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (900001, "", "en", "edge"),
    (900002, "   \n\t  ", "en", "edge"),
    (900003, "a", "en", "edge"),
    (900004, None, "en", "edge"),
    (900005, "héllo wörld 你好世界 🌍 héllo wörld", "zz", "edge"),
    (900006, "!!! ??? ... ;;; ---", "en", "edge"),
    (900007, "x" * 2000, "en", "edge"),
    (900008, ("the " * 300).strip(), "en", "edge"),
    (900009, "no language tag on this row", None, "edge"),
    (900010, "no source tag on this row", "en", None),
    (900011, 'he said "it\'s | 100% \\ done" -- twice', "en", "edge"),
    (900012, "line one\nline two\ttabbed\rreturn", "en", "edge"),
]

_BIG = 1.0e30  # inf-producing dot products, finite in float32 storage


def edge_embeddings() -> list[tuple[int, list[float] | None, int | None]]:
    unit = [0.0] * DIM
    unit[0] = 1.0
    null_elem: list[float | None] = [1.0] * DIM
    null_elem[3] = None
    return [
        (900001, [0.0] * DIM, 0),          # zero norm
        (900002, None, 1),                 # NULL vector
        (900003, null_elem, 2),            # NULL element
        (900004, unit, None),              # NULL label
        (900005, [_BIG] * DIM, 3),         # inf dot / NaN cosine
        (900006, [-x for x in unit], 4),   # antipodal unit
    ]


def build(base: str, out: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copyfile(
            os.path.join(base, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )

    docs = pq.read_table(os.path.join(base, "documents.parquet"))
    extra = pa.table(
        {
            "doc_id": pa.array([r[0] for r in EDGE_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in EDGE_DOCS], pa.string()),
            "lang": pa.array([r[2] for r in EDGE_DOCS], pa.string()),
            "source": pa.array([r[3] for r in EDGE_DOCS], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else None for r in EDGE_DOCS],
                pa.int64(),
            ),
        }
    )
    merged = pa.concat_tables(
        [docs.select(extra.column_names), extra.select(extra.column_names)]
    )
    pq.write_table(merged, os.path.join(out, "documents.parquet"))

    emb = pq.read_table(os.path.join(base, "embeddings.parquet"))
    rows = edge_embeddings()
    extra_e = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    merged_e = pa.concat_tables(
        [emb.select(extra_e.column_names), extra_e.select(extra_e.column_names)]
    )
    pq.write_table(merged_e, os.path.join(out, "embeddings.parquet"))
    return out


def corpus_entries() -> list[str]:
    """Registry entries whose oracle SQL reads documents/embeddings —
    the surface the adversarial block can reach."""
    import __spark_entry__ as entry

    out = []
    for name, sql in entry.oracle_sql().items():
        low = sql.lower()
        if "documents" in low or "embeddings" in low:
            out.append(name)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/edge_sf")
    ap.add_argument("--list-corpus", action="store_true")
    args = ap.parse_args(argv)
    if args.list_corpus:
        print(" ".join(corpus_entries()))
        return 0
    path = build(args.base, args.out)
    print(f"edge corpus written to {path} "
          f"({len(EDGE_DOCS)} edge docs, {len(edge_embeddings())} edge vectors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
