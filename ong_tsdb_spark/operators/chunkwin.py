"""Chunk-parallel per-series windows: lag / lead / rolling / range frames.

``PARTITION BY series`` windows with low key cardinality funnel each
series' entire history through ONE task — a handful of event types over
years of data is a single-task sort at 100 TB regardless of cluster
size.  This module generalizes the two-pass trick of
``operators/prefix.py`` (running totals) to every *bounded-lookback*
frame the ts_* analytic family uses:

* ``lag(k)`` / ``ROWS k PRECEDING``  — the frame reaches at most k rows
  into the past;
* ``lead(k)`` — at most k rows into the future;
* ``RANGE r PRECEDING`` — at most r order-units into the past.

Re-chunk the series on a monotone bucket of the leading order column
(e.g. week), ship each chunk the few **carry rows** its frames can see
beyond the chunk edge, run the identical window WITHIN ``(key, chunk)``,
and drop the carries from the output.  Every frame then contains exactly
the rows the global window would have used — outputs are bit-identical
(same rows, same expressions, same evaluation order) — while parallelism
becomes keys x chunks.

Carry construction stays exact for sparse chunks: the last k rows before
a chunk necessarily live in the k nearest *non-empty* prior chunks (each
non-empty chunk contributes >= 1 row), so candidate carries are bounded
at k rows x k chunks per target and ranked back down to k.  Range
carries are simpler — with ``range_before <= chunk_len`` the frame can
only reach the value-adjacent previous chunk, so a plain filter on the
order column finds them (empty predecessors need nothing: any older row
is provably outside the frame).

All carry frames are tiny (keys x chunks x k rows); the only full-data
costs are the chunk-keyed shuffles, each with keys x chunks parallelism.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

CHUNK_COL = "__chunk"


def _edge_rows(
    work: DataFrame, key_cols: list[str], order_cols: list[str], k: int, last: bool
) -> DataFrame:
    """The k last (or first) rows of every (key, chunk) partition.

    k == 1 (the lag/lead-by-one majority) uses a max/min-of-struct
    aggregate: unlike a row_number window (full-sort shuffle of every
    row), the agg partially combines map-side, so the shuffle carries
    ~one row per (key, chunk) per mapper.  The struct leads with the
    order columns, so the comparison IS the caller's total order; the
    payload columns ride along untouched."""
    data_cols = [c for c in work.columns if c not in (*key_cols, CHUNK_COL)]
    if k == 1:
        rest = [c for c in data_cols if c not in order_cols]
        s = F.struct(*[F.col(c) for c in order_cols], *[F.col(c) for c in rest])
        g = work.groupBy(*key_cols, CHUNK_COL).agg(
            (F.max(s) if last else F.min(s)).alias("__edge")
        )
        return g.select(
            *key_cols, CHUNK_COL, *[F.col(f"__edge.{c}").alias(c) for c in data_cols]
        )
    order = (
        [F.col(c).desc() for c in order_cols] if last else [F.col(c) for c in order_cols]
    )
    w = Window.partitionBy(*key_cols, CHUNK_COL).orderBy(*order)
    return (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _cascade(
    work: DataFrame,
    edges: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    k: int,
    before: bool,
) -> DataFrame:
    """Deliver edge rows to the chunks whose frames can see them.

    Chunks are ranked per key by a window over the distinct chunk list
    (keys x chunks rows — tiny), so a target chunk's carries come from
    its k nearest non-empty neighbours even when chunks hold fewer than
    k rows each; a final per-target rank trims the k*k candidates back
    to the k rows the global frame actually reaches.  The chunk list
    comes from the EDGES frame (>= 1 edge row per non-empty chunk, so
    the same chunk set as the full data) — no full-data distinct.
    """
    # NULL-SAFE key joins throughout (code-review r9, edge corpus):
    # the within-chunk window PARTITION BY treats a NULL series key as
    # a real group, so a NULL-keyed series spanning several chunks
    # NEEDS its cross-chunk carries — plain equi-joins dropped them
    # silently (NULL never equals NULL), so lag/lead at that series'
    # chunk edges would diverge from the global-window plan.  Same fix
    # class as operators/gapfill._ns_join; <=> keys stay hash-joinable.
    from .gapfill import _ns_join

    idx = (
        edges.select(*key_cols, CHUNK_COL)
        .distinct()
        .withColumn(
            "__ci",
            F.row_number().over(Window.partitionBy(*key_cols).orderBy(CHUNK_COL)),
        )
    )
    src = (
        _ns_join(edges, idx, [*key_cols, CHUNK_COL])
        .withColumnRenamed("__ci", "__src_ci")
        .withColumnRenamed(CHUNK_COL, "__src_chunk")
    )
    tgt = (
        idx.withColumnRenamed("__ci", "__tgt_ci")
        .withColumnRenamed(CHUNK_COL, "__tgt_chunk")
    )
    delta = (
        (F.col("__tgt_ci") - F.col("__src_ci"))
        if before
        else (F.col("__src_ci") - F.col("__tgt_ci"))
    )
    cand = _ns_join(src, tgt, list(key_cols)).filter((delta >= 1) & (delta <= k))
    rank_order = (
        [F.col(c).desc() for c in order_cols] if before else [F.col(c) for c in order_cols]
    )
    wr = Window.partitionBy(*key_cols, "__tgt_chunk").orderBy(*rank_order)
    keep = cand.withColumn("__rn", F.row_number().over(wr)).filter(F.col("__rn") <= k)
    data_cols = [c for c in work.columns if c != CHUNK_COL]
    return keep.select(*data_cols, F.col("__tgt_chunk").alias(CHUNK_COL))


def chunked_window(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    chunk_len: int,
    build: Callable[[WindowSpec], dict[str, Column]],
    rows_before: int = 0,
    rows_after: int = 0,
    range_before: int | float | None = None,
) -> DataFrame:
    """Evaluate per-key window expressions with keys x chunks tasks.

    ``build`` receives the within-chunk WindowSpec (``PARTITION BY
    key_cols, chunk ORDER BY order_cols``) and returns ``{out_col:
    expression}``; apply ``.rowsBetween`` / ``.rangeBetween`` on the
    spec as needed, but the frame must not look back more than
    ``rows_before`` rows (or ``range_before`` units of the leading
    order column) nor forward more than ``rows_after`` rows — those
    bounds size the carries.  The leading order column must be numeric;
    chunks are ``floor(order0 / chunk_len)``.

    Output = all input columns plus the built columns, bit-identical to
    the same expressions over ``Window.partitionBy(*key_cols)``.
    """
    if rows_before and range_before is not None:
        raise ValueError(
            "rows_before and range_before size backward carries differently; "
            "use one backward carry mode per call"
        )
    if range_before is not None and range_before > chunk_len:
        raise ValueError("range_before must be <= chunk_len (frame spans one chunk back)")
    ord0 = F.col(order_cols[0])
    work = df.withColumn(CHUNK_COL, F.floor(ord0 / F.lit(chunk_len)).cast("long"))
    aug = work.withColumn("__carry", F.lit(False))
    if range_before is not None:
        edge = (F.col(CHUNK_COL) + F.lit(1)) * F.lit(chunk_len)
        carry = (
            work.filter(ord0 >= edge - F.lit(range_before))
            .withColumn(CHUNK_COL, F.col(CHUNK_COL) + F.lit(1))
            .withColumn("__carry", F.lit(True))
        )
        aug = aug.unionByName(carry)
    if rows_before:
        tails = _edge_rows(work, key_cols, order_cols, rows_before, last=True)
        carry = _cascade(work, tails, key_cols, order_cols, rows_before, before=True)
        aug = aug.unionByName(carry.withColumn("__carry", F.lit(True)))
    if rows_after:
        heads = _edge_rows(work, key_cols, order_cols, rows_after, last=False)
        carry = _cascade(work, heads, key_cols, order_cols, rows_after, before=False)
        aug = aug.unionByName(carry.withColumn("__carry", F.lit(True)))
    w = Window.partitionBy(*key_cols, CHUNK_COL).orderBy(*[F.col(c) for c in order_cols])
    outs = build(w)
    out = aug.select("*", *[col.alias(name) for name, col in outs.items()])
    return out.filter(~F.col("__carry")).drop("__carry", CHUNK_COL)
