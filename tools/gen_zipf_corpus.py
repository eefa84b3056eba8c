#!/usr/bin/env python
"""Zipfian word-frequency corpus generator (VERDICT r9 #3).

The driver's sf* documents tables have a deliberately tiny word
vocabulary (31 types at sf0.1), so character-initialized BPE exhausts
at 89 merges there — the production-regime acceptance curve could only
be measured on the synthetic n-gram symbol space.  This generator
builds a corpus with a REALISTIC word-frequency profile — >=10k
distinct word types with Zipf(s) ranked frequencies and morphology-ish
internal structure (syllable concatenation, so BPE actually has
sub-word statistics to learn) — without touching the driver testdata
(tools/gen_scale.py is the precedent for derived corpora under /tmp).

    python tools/gen_zipf_corpus.py [DST] [--vocab 12000] [--docs 20000]
        [--words-per-doc 60] [--s 1.05] [--seed 42]

Writes ``DST/documents.parquet`` with the driver's documents schema
(doc_id, text, lang, source, n_chars).  Fully deterministic for a
given seed.  Consume with:

    SPARK_GRAFT_SF_DIR=<DST> python tools/bpe_scale.py 5000 --natural
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ONSETS = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t",
          "v", "z", "ch", "sh", "th", "br", "st", "tr"]
NUCLEI = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
CODAS = ["", "", "n", "r", "s", "t", "l", "nd", "st"]


def make_vocab(n_types: int, rng: np.random.Generator) -> list[str]:
    """``n_types`` DISTINCT words, frequent ranks shorter (2 syllables)
    and rare ranks longer (up to 4) — the length/rank correlation real
    lexicons show, which is what makes sub-word units pay off."""
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n_types:
        n_syll = 2 + int(len(out) / max(n_types / 3, 1))
        w = "".join(
            ONSETS[rng.integers(len(ONSETS))]
            + NUCLEI[rng.integers(len(NUCLEI))]
            + CODAS[rng.integers(len(CODAS))]
            for _ in range(min(n_syll, 4))
        )
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dst", nargs="?", default="/tmp/zipf_corpus")
    ap.add_argument("--vocab", type=int, default=12000)
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--words-per-doc", type=int, default=60)
    ap.add_argument("--s", type=float, default=1.05,
                    help="Zipf exponent (freq ~ 1/rank^s)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    vocab = np.array(make_vocab(args.vocab, rng))
    ranks = np.arange(1, args.vocab + 1, dtype=np.float64)
    p = ranks ** -args.s
    p /= p.sum()

    n_words = args.docs * args.words_per_doc
    idx = rng.choice(args.vocab, size=n_words, p=p)
    words = vocab[idx].reshape(args.docs, args.words_per_doc)
    texts = [" ".join(row) for row in words]
    n_distinct = len(np.unique(idx))

    os.makedirs(args.dst, exist_ok=True)
    tbl = pa.table({
        "doc_id": pa.array(range(args.docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["zz"] * args.docs, pa.string()),
        "source": pa.array(
            ["zipf%d" % (i % 4) for i in range(args.docs)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    out = os.path.join(args.dst, "documents.parquet")
    pq.write_table(tbl, out)
    print(f"wrote {out}: {args.docs} docs, {n_words} tokens, "
          f"{n_distinct}/{args.vocab} word types realized, "
          f"zipf s={args.s} seed={args.seed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
