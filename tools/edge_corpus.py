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
vectors and a NULL label — and to ``events`` (event_id >= 900001):
NULL timestamp / user / type / value, NaN value, and NULL / empty /
malformed / shape-shifted JSON ``props`` (events doubles as the tick
table, so these rows also reach every ts_* entry).  The other seven
tables are copied verbatim so every registry entry still runs.

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
    nan_elem: list[float | None] = [1.0] * DIM
    nan_elem[7] = float("nan")
    return [
        (900001, [0.0] * DIM, 0),          # zero norm
        (900002, None, 1),                 # NULL vector
        (900003, null_elem, 2),            # NULL element
        (900004, unit, None),              # NULL label
        (900005, [_BIG] * DIM, 3),         # inf dot / NaN cosine
        (900006, [-x for x in unit], 4),   # antipodal unit
        (900007, nan_elem, 5),             # NaN element: engines rank
        # NaN cosines OPPOSITELY (SQL above all doubles, numpy below)
    ]


#: (event_id, ts ISO string or None, user_id, event_type, value, props)
EDGE_EVENTS = [
    (900001, None, 9001, "view", 1.0, '{"k": 1}'),          # NULL ts
    (900002, "2024-01-02T00:00:00", None, "view", 1.0, '{"k": 2}'),
    (900003, "2024-01-02T00:01:00", 9001, None, 1.0, '{"k": 3}'),
    (900004, "2024-01-02T00:02:00", 9001, "view", None, '{"k": 4}'),
    (900005, "2024-01-02T00:03:00", 9001, "view", float("nan"), '{"k": 5}'),
    (900006, "2024-01-02T00:04:00", 9002, "purchase", 2.0, None),   # NULL props
    (900007, "2024-01-02T00:05:00", 9002, "purchase", 2.0, ""),     # empty props
    (900008, "2024-01-02T00:06:00", 9002, "purchase", 2.0, '{"k": '),  # cut JSON
    (900009, "2024-01-02T00:07:00", 9003, "signup", 3.0, '{"k": "str"}'),
    # ~2 years past the corpus: far enough that gap-fill entries must
    # extend their grid across a real horizon (and the retention
    # triangle gains a distant period), near enough that the DuckDB
    # oracle's single-threaded window over the materialized grid stays
    # seconds, not minutes (a 2099 tick made it a 2.6M-row grid)
    (900010, "2026-12-31T23:59:59", 9003, "view", 4.0, '{"nested": {"k": 6}}'),
]


def build(base: str, out: str) -> str:
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        shutil.copyfile(
            os.path.join(base, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )

    ev = pq.read_table(os.path.join(base, "events.parquet"))
    ts_type = ev.schema.field("ts").type  # NANOS vs us varies by round
    extra_ev = pa.table(
        {
            "event_id": pa.array([r[0] for r in EDGE_EVENTS], pa.int64()),
            "ts": pa.array(
                [
                    dt.datetime.fromisoformat(r[1]) if r[1] else None
                    for r in EDGE_EVENTS
                ],
                ts_type,
            ),
            "user_id": pa.array([r[2] for r in EDGE_EVENTS], pa.int64()),
            "event_type": pa.array([r[3] for r in EDGE_EVENTS], pa.string()),
            "value": pa.array([r[4] for r in EDGE_EVENTS], pa.float64()),
            "props": pa.array([r[5] for r in EDGE_EVENTS], pa.string()),
        }
    )
    merged_ev = pa.concat_tables(
        [ev.select(extra_ev.column_names), extra_ev.select(extra_ev.column_names)]
    )
    pq.write_table(merged_ev, os.path.join(out, "events.parquet"))

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
    """Registry entries whose oracle SQL reads a table carrying an
    adversarial block (documents / embeddings / events) — the surface
    the edge rows can reach.  events doubles as the ts_* tick table,
    so the time-series entries are in scope too."""
    import __spark_entry__ as entry

    out = []
    for name, sql in entry.oracle_sql().items():
        low = sql.lower()
        if "documents" in low or "embeddings" in low or "events" in low:
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
          f"({len(EDGE_DOCS)} edge docs, {len(edge_embeddings())} edge vectors, "
          f"{len(EDGE_EVENTS)} edge events)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
