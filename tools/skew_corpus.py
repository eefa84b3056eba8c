#!/usr/bin/env python
"""Build a SKEWED scale-factor directory for shuffle-stress replays.

The driver's synthetic corpus is uniform: sources, users, texts,
vectors and join keys are all near-evenly distributed, so every
shuffle in the repo rides balanced partitions.  At 100 TB that is the
exception, not the rule — one crawl source owns half the corpus, one
bot user owns half the event stream, boilerplate text repeats across
a quarter of all documents, and a hot join key concentrates a join's
probe side on one task.  This tool clones a base sf dir and rewrites
key columns IN PLACE (row counts unchanged, deterministic by id
parity) to produce exactly those shapes:

- ``documents``: every even ``doc_id`` gets ``source='hot_source'``
  (50% single-source mass → hot groupBy/epoch-mix/classifier keys);
  every ``doc_id % 4 == 0`` additionally gets one fixed boilerplate
  paragraph as ``text`` (25% EXACT-duplicate mass → one hot md5
  digest, hot MinHash bands, hot shingles, one giant duplicate
  cluster, hot simhash buckets; ``n_chars`` kept consistent).
- ``embeddings``: every even ``vec_id`` gets one fixed vector (50%
  identical vectors → one hot IVF cell / LSH bucket, one giant
  semantic-dedup cluster, and MASSIVE similarity ties — any top-k
  whose tie-break is not pinned goes nondeterministic here).
- ``events``: every even ``event_id`` gets ``user_id=424242`` (50%
  single-series mass → one giant window partition in every per-user
  window, as-of join, funnel and sessionization).
- ``lineitem``: every even ``l_orderkey`` is rewritten to the minimum
  orderkey (50% hot join key into the orders⋈lineitem join; duplicate
  (orderkey, linenumber) pairs are intentional).

The oracle replay then runs Spark AND DuckDB over the SAME skewed
parquet, so the verdict is cross-engine exactness under skew — not
merely survival:

    python tools/skew_corpus.py [--base /root/testdata/sf0.01] \
                                [--out /tmp/skew_sf]
    python tools/replay.py --sf-dir /tmp/skew_sf

Cite: reference has no skew handling to mirror (single-node, one file
per chunk); this axis exists for the 100 TB target where skewed
shuffle keys are the canonical straggler source.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_SOURCE = "hot_source"
HOT_USER = 424242
#: ~40 words / ~260 chars of boilerplate — long enough to carry
#: shingles, MinHash signatures and simhash mass like a real page
HOT_TEXT = (
    "all rights reserved this page is part of the archive please "
    "enable javascript to view the content cookie policy terms of "
    "service privacy notice subscribe to our newsletter for updates "
    "copyright the respective owners contact us for permissions"
)


def hot_vector(dim: int) -> list[float]:
    """One fixed, deterministic, non-degenerate unit-norm vector."""
    raw = [((i * 2654435761 + 12345) % 1000) / 1000.0 - 0.5 for i in range(dim)]
    norm = sum(x * x for x in raw) ** 0.5
    return [x / norm for x in raw]


def build(base: str, out: str) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in "region nation customer supplier part orders".split():
        shutil.copyfile(
            os.path.join(base, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )

    docs = pq.read_table(os.path.join(base, "documents.parquet"))
    even = pc.equal(pc.bit_wise_and(docs["doc_id"], 1), 0)
    quarter = pc.equal(
        pc.bit_wise_and(docs["doc_id"], 3), 0)
    source = pc.if_else(even, pa.scalar(HOT_SOURCE), docs["source"])
    text = pc.if_else(quarter, pa.scalar(HOT_TEXT), docs["text"])
    n_chars = pc.if_else(
        quarter, pa.scalar(len(HOT_TEXT), pa.int64()),
        pc.cast(docs["n_chars"], pa.int64()))
    pq.write_table(
        pa.table({
            "doc_id": docs["doc_id"], "text": text, "lang": docs["lang"],
            "source": source, "n_chars": n_chars,
        }),
        os.path.join(out, "documents.parquet"))

    emb = pq.read_table(os.path.join(base, "embeddings.parquet"))
    dim = len(emb["embedding"][0].as_py())
    # batch conversion + one hoisted hot list — per-row .as_py() in a
    # loop re-deserialized the hot vector n/2 times (code-review r10)
    hot_list = hot_vector(dim)
    even_v = pc.equal(pc.bit_wise_and(emb["vec_id"], 1), 0).to_pylist()
    old_vecs = emb["embedding"].to_pylist()
    vecs = pa.array(
        [hot_list if e else v for e, v in zip(even_v, old_vecs)],
        type=pa.list_(pa.float32()))
    pq.write_table(
        pa.table({"vec_id": emb["vec_id"], "embedding": vecs,
                  "label": emb["label"]}),
        os.path.join(out, "embeddings.parquet"))

    ev = pq.read_table(os.path.join(base, "events.parquet"))
    even_e = pc.equal(pc.bit_wise_and(ev["event_id"], 1), 0)
    user = pc.if_else(even_e, pa.scalar(HOT_USER, pa.int64()),
                      pc.cast(ev["user_id"], pa.int64()))
    pq.write_table(
        pa.table({
            "event_id": ev["event_id"], "ts": ev["ts"], "user_id": user,
            "event_type": ev["event_type"], "value": ev["value"],
            "props": ev["props"],
        }),
        os.path.join(out, "events.parquet"))

    li = pq.read_table(os.path.join(base, "lineitem.parquet"))
    hot_ok = pc.min(li["l_orderkey"]).as_py()
    even_l = pc.equal(pc.bit_wise_and(li["l_orderkey"], 1), 0)
    okey = pc.if_else(even_l, pa.scalar(hot_ok, pa.int64()),
                      pc.cast(li["l_orderkey"], pa.int64()))
    cols = {c: li[c] for c in li.column_names}
    cols["l_orderkey"] = okey
    pq.write_table(pa.table(cols), os.path.join(out, "lineitem.parquet"))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/skew_sf")
    args = ap.parse_args(argv)
    path = build(args.base, args.out)
    print(f"skew corpus written to {path} (50% hot source/user/vector/"
          f"orderkey, 25% exact-duplicate text)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
