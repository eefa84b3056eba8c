"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force top-k against one query vector: the
  query is a literal array (broadcast by construction, no shuffle);
  the dot product is a deterministic left-to-right Catalyst fold
  (``aggregate(zip_with(...))``) in double precision, bit-identical
  to the oracle's sequential ``list_reduce`` fold.  One narrow scan +
  one row_number over a single partition of k candidates.
* ``cosine_pairs_blocked`` — IVF-style blocked near-neighbor pairs:
  only vectors sharing a block key (e.g. a coarse cluster / label)
  are compared, turning O(n^2) into sum over blocks of O(b^2).  At
  100 TB block keys come from a coarse quantizer; the join is an
  equi-join on the block key so Catalyst shuffles each block to one
  task.
* ``lsh_cosine_buckets`` — random-hyperplane LSH: sign-bit sketches
  via deterministic seeded projections, bucket equi-join as the
  scale path for unblocked corpora.

All expressions are built-ins (zip_with/aggregate/sqrt) inside
whole-stage codegen; no UDF, no driver-side loops.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lit_double_array_sql(vals) -> str:
    """SQL text for a literal double array.

    Construction-cost fix (optimization r14, guide §7.3 driver
    overhead): ``F.array(*[F.lit(v).cast("double") ...])`` costs ~2*dim
    py4j round-trips PER ARRAY (~1-3 ms each), which made every
    64-dim literal vector ~0.15 s of pure driver latency and the
    8-plane LSH bucket ~2.5 s — per query construction, per lap.  One
    parsed SQL string is a single round-trip.  ``repr(float)`` is
    shortest-round-trip, and both the JVM parser and Python resolve it
    to the identical IEEE-754 double, so the parsed literals are
    bit-identical to the F.lit path.  Callers must guard non-finite
    values (repr(nan)/'inf' are not SQL literals) — see
    :func:`_finite_floats`."""
    return "array(" + ", ".join(f"{float(v)!r}D" for v in vals) + ")"


def _finite_floats(vals) -> bool:
    """True iff every element is a finite float (the precondition for
    :func:`_lit_double_array_sql`)."""
    try:
        return all(math.isfinite(float(v)) for v in vals)
    except (TypeError, ValueError):
        return False


def _dot_fold_sql(a: str, b: str) -> str:
    """SQL text of the deterministic left-to-right double dot-product
    fold — the exact parser-level twin of :func:`_dot` (same
    ``aggregate(zip_with(...))`` Catalyst operators after parsing)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Deterministic sequential (left-to-right) dot product in double.

    The ``aggregate(zip_with(...))`` fold measured *faster* than an
    unrolled 64-term ``element_at`` sum (1.1 s vs 4.6 s on the sf0.1
    blocked-pair join) — the unrolled expression tree blows past
    codegen limits while the fold is a tight interpreted loop.  ``dim``
    is accepted for signature stability but unused.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    # try_divide: a zero-norm vector yields NULL (like the SQL oracle's
    # 0/0) instead of an ANSI DIVIDE_BY_ZERO error — identical to plain
    # division on every nonzero-norm input
    return F.try_divide(_dot(a, b, dim), _norm(a, dim) * _norm(b, dim))


def _infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Array length from the first row — embeddings are fixed-width."""
    row = df.select(F.size(F.col(vec_col))).first()
    return int(row[0]) if row and row[0] is not None and row[0] > 0 else None


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Top-k rows by cosine similarity to a literal query vector.
    Deterministic ordering: (cosine desc, id asc)."""
    dim = len(query_vec)
    if _finite_floats(query_vec):
        # one parsed literal array instead of 2*dim py4j round-trips
        q = F.expr(_lit_double_array_sql(query_vec))
    else:
        q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    scored = df.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q, dim).alias("cosine")
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    # orderBy().limit(k) compiles to TakeOrderedAndProject: each task
    # keeps a k-row heap, the driver merges per-partition heaps — no
    # global shuffle, no single-task window over the full corpus.
    # Ranks are then attached with a window over just the k rows.
    order = [F.col("cosine").desc(), F.col(id_col).asc()]
    topk = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "cosine", "rank"
    )


#: default block-size cap for the pair joins — ON by default so an
#: unexamined call can never produce an unbounded quadratic straggler;
#: pass ``max_block_size=None`` to explicitly opt out.
DEFAULT_BLOCK_CAP = 1024


def finite_vector_filter(vec_col: Column) -> Column:
    """True iff the vector is non-null with every element a FINITE
    number — the eligibility bar for the float pair family (code-
    review r9, second pass).  A NaN element makes the cosine NaN,
    which numpy's threshold DROPS while Spark SQL and DuckDB (both
    order NaN above every double) would EMIT — pairwise similarity is
    defined over finite vectors only, pinned identically in all three
    executors and in the oracles' kept CTEs."""
    xd = lambda x: x.cast("double")  # noqa: E731
    return vec_col.isNotNull() & ~F.exists(
        vec_col,
        lambda x: x.isNull()
        | F.isnan(xd(x))
        | (F.abs(xd(x)) == F.lit(float("inf"))),
    )


def cosine_pairs_blocked(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_block_size: int | None = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Embedding near-duplicate pairs within blocks: (d1 < d2,
    cosine >= threshold).  The block key bounds the quadratic term.

    ``max_block_size`` (default :data:`DEFAULT_BLOCK_CAP`) enforces the
    bound *by construction*: blocks larger than the cap are excluded
    from the pair join entirely (a hot block at 100x data would
    otherwise become one quadratic straggler task — route such blocks
    through a finer quantizer or a smaller cap with
    ``cosine_pairs_blocked_numpy``).  The size census reuses the same
    shuffle key as the join, so the cap costs one small aggregate.

    Norms are computed once per *vector* (O(n)) and joined through, so
    each pair evaluates only one unrolled dot product (O(pairs)) —
    cosine = dot/(norm_a*norm_b) is the same expression either way."""
    dim = None  # the fold-based _dot/_norm never consume it — an
    # _infer_dim here cost one extra Spark job per call (r9 review)
    # materialized once: the projection carries computed expressions
    # (quantizer block keys, the norm fold), and the three consumers
    # (size census, both self-join sides) get no ReusedExchange from
    # Catalyst — without this the folds run 3x per vector
    from .dedup import materialize_for_self_join

    slim = materialize_for_self_join(
        df.select(
            F.col(id_col),
            F.col(block_col).alias("__blk"),
            F.col(vec_col),
            _norm(F.col(vec_col), dim).alias("__nrm"),
        )
    )
    if max_block_size is not None:
        sizes = slim.groupBy("__blk").agg(F.count("*").alias("__bn"))
        keep = sizes.filter(F.col("__bn") <= max_block_size).select("__blk")
        slim = slim.join(F.broadcast(keep), on="__blk")
    # finite vectors only, AFTER the census (see finite_vector_filter
    # and the numpy twin) — keeps the fold path, the BLAS path, and
    # the oracles emitting the same pair set on dirty corpora
    slim = slim.filter(finite_vector_filter(F.col(vec_col)))
    a, b = slim.alias("a"), slim.alias("b")
    # try_divide, not '/': under ANSI mode (Spark 4 default) a plain
    # Divide THROWS on a zero-norm vector in the block; NULL cosine
    # falls out of the threshold filter like cosine_similarity's
    cos = F.try_divide(
        _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), dim),
        F.col("a.__nrm") * F.col("b.__nrm"),
    )
    return (
        a.join(b, on="__blk")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            cos.alias("cosine"),
        )
        # null-tolerant threshold: prevents isnotnull-constraint
        # inference from substituting the norm/dot expressions into
        # pushed-down filters (see dedup.ngram_jaccard_pairs)
        .filter(F.coalesce(F.col("cosine") >= threshold, F.lit(False)))
    )


def cosine_pairs_blocked_numpy(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    max_block_size: int | None = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """The BLAS scale path for blocked near-dup pairs: one
    ``applyInPandas`` per block computes the whole similarity matrix
    with a numpy matmul (vectorized C, ~4x faster than the Catalyst
    fold at sf0.1 and widening with block size).  Output cosines are
    rounded so they agree with sequential-fold oracles despite BLAS
    summation order (differences are ~1e-15, far below the rounding
    grain).  Requires each block to fit one executor's memory — the
    IVF contract (block = coarse cluster); ``max_block_size`` (default
    :data:`DEFAULT_BLOCK_CAP`) enforces it by dropping oversized
    blocks, like :func:`cosine_pairs_blocked`."""
    import numpy as np
    import pandas as pd

    if max_block_size is not None:
        sizes = df.groupBy(block_col).agg(F.count("*").alias("__bn"))
        keep = sizes.filter(F.col("__bn") <= max_block_size).select(block_col)
        df = df.join(F.broadcast(keep), on=block_col)

    # dirty vectors (NULL / null-element / non-finite-element) cannot
    # form a pair: a bare np.array over a batch containing None is an
    # inhomogeneous-shape crash that kills the whole job, and a NaN
    # cosine COMPARES DIFFERENTLY per engine (numpy: NaN >= t is
    # False; Spark SQL and DuckDB both order NaN above every double,
    # so their threshold would EMIT the pair) — pairwise similarity is
    # defined over finite vectors only, on every path and oracle
    # (code-review r9, both passes).  Filter AFTER the size census so
    # the block-cap decision still counts every row, exactly like the
    # oracles' sizes CTE.
    df = df.filter(finite_vector_filter(F.col(vec_col)))

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"d1": [], "d2": [], "cosine": []}).astype(
                {"d1": "int64", "d2": "int64", "cosine": "float64"}
            )
        # per-length grouping: pairs are defined between SAME-dimension
        # vectors only (the _DOT_SQL twin nulls cross-length dots); a
        # single wrong-width vector must not crash the block's matmul
        lens = pdf[vec_col].map(len)
        if lens.nunique() > 1:
            parts = [
                block(sub.reset_index(drop=True))
                for _, sub in pdf.groupby(lens)
            ]
            return pd.concat(parts, ignore_index=True)
        M = np.array([np.asarray(e, dtype=np.float64) for e in pdf[vec_col]])
        ids = pdf[id_col].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        iu = np.triu_indices(len(ids), 1)
        # threshold the ROUNDED cosine: BLAS vs sequential-fold sums
        # differ by ~1e-15, so a raw-value threshold could disagree
        # with the oracle on MEMBERSHIP for a pair sitting exactly at
        # the cut; rounding first makes the decision identical
        rounded = np.round(S[iu], round_digits)
        mask = rounded >= threshold
        d1 = np.minimum(ids[iu[0][mask]], ids[iu[1][mask]])
        d2 = np.maximum(ids[iu[0][mask]], ids[iu[1][mask]])
        return pd.DataFrame({"d1": d1, "d2": d2, "cosine": rounded[mask]})

    return df.groupBy(block_col).applyInPandas(block, "d1 long, d2 long, cosine double")


# ----------------------------------------------------------------------
# IVF: deterministic k-means coarse quantizer + nprobe search
# ----------------------------------------------------------------------
#: fixed global quantization scale for the integer-exact IVF path.
#: 2^20 is a power of two, so ``float32 -> double -> * SCALE`` incurs
#: ZERO rounding (the mantissa just shifts); ``floor`` then lands on an
#: exact integer.  Every engine that implements IEEE-754 doubles
#: produces the same bigint — the foundation of the cross-engine
#: reproducibility of ``train_ivf_centroids_exact``.
IVF_QUANT_SCALE = 1 << 20

#: element-magnitude bound for the integer-exact family.  Quantized
#: values stay <= 2^7 * 2^20 = 2^27, so a squared-L2 term is <= 2^56
#: and a 64-dim fold <= 2^62 — no bigint overflow anywhere in the
#: Lloyd's chain.  Real embedding spaces are unit-ish; an element
#: beyond 128 (or NaN/Inf) is corrupt data, and ONE such vector must
#: not ANSI-kill a 100 TB training job: it quantizes to a NULL element
#: here (the single choke point every exact path goes through) and the
#: existing null-element plumbing routes the row around — NULL
#: cluster, NULL codes, excluded from training (code-review r9: the
#: edge-corpus replay job-killed on a 1e30 vector before this).
EXACT_MAX_ABS = 1 << 7


def ivf_quantize_expr(vec_col: Column) -> Column:
    """array<bigint> of floor(x * 2^20) — bit-exact in any engine.
    Non-finite or out-of-range elements (|x| > EXACT_MAX_ABS) become
    NULL, marking the row ineligible for the exact pipelines."""

    def q(x: Column) -> Column:
        xd = x.cast("double")
        ok = (
            x.isNotNull()
            & ~F.isnan(xd)
            & (F.abs(xd) <= F.lit(float(EXACT_MAX_ABS)))
        )
        return F.when(
            ok, F.floor(xd * F.lit(float(IVF_QUANT_SCALE))).cast("long")
        )

    return F.transform(vec_col, q)


def ivf_quantize_py(vec: list[float]) -> list[int | None]:
    """Driver-side twin of :func:`ivf_quantize_expr` (Python floats are
    IEEE doubles; * 2^20 is exact, ``math.floor`` matches SQL floor);
    mirrors the eligibility bound — dirty elements map to None."""
    import math

    out: list[int | None] = []
    for x in vec:
        if x is None:
            out.append(None)
            continue
        xf = float(x)
        if math.isnan(xf) or abs(xf) > EXACT_MAX_ABS:
            out.append(None)
        else:
            out.append(math.floor(xf * float(IVF_QUANT_SCALE)))
    return out


def quantize_query_or_raise(vec: list[float]) -> list[int]:
    """Quantize a QUERY vector for the exact family, raising a clear
    ValueError if any element is dirty (NULL/NaN/Inf or beyond
    EXACT_MAX_ABS).  Corpus rows route around the exact chain via NULL
    codes, but a query has nowhere to route — and the driver-side
    integer arithmetic downstream would otherwise die with a bare
    TypeError on the None elements (code-review r9, second pass)."""
    qq = ivf_quantize_py(vec)
    if any(v is None for v in qq):
        raise ValueError(
            "query vector contains NULL/NaN/Inf elements or |x| > "
            f"{EXACT_MAX_ABS} — not searchable in the integer-exact family"
        )
    return qq  # type: ignore[return-value]


def _centroid_literal_long(vec: list[int]) -> Column:
    return F.array(*[F.lit(int(x)).cast("long") for x in vec])


def _sqdist_long(vec_col: Column, centroid: list[int]) -> Column:
    """Squared L2 distance between a bigint vector column and a bigint
    centroid literal — pure integer arithmetic, exact and
    order-independent (each term is computed per-position; the fold
    order is fixed left-to-right but integer addition is associative
    anyway)."""
    carr = _centroid_literal_long(centroid)
    diffs = F.zip_with(vec_col, carr, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, d: acc + d)


def _nearest_centroid_l2(qv_col: Column, centroids: list[list[int]]) -> Column:
    """argmin over integer centroid literals by squared L2 — an
    array_min over (dist, idx) structs, fully JVM-side, exact."""
    entries = [
        F.struct(_sqdist_long(qv_col, c).alias("dist"), F.lit(i).alias("idx"))
        for i, c in enumerate(centroids)
    ]
    return F.array_min(F.array(*entries))["idx"]


def _assign_exact_arrow(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Arrow fast path for the integer-exact assignment: per batch,
    one int64 matmul computes every (vector, centroid) distance —
    identical results to the Catalyst fold because EVERY operation is
    exact int64 arithmetic (products < 2^47, no rounding to agree on)
    and ``np.argmin`` returns the FIRST minimum, i.e. the same
    lowest-index tie-break.  ~100x less interpreter overhead than
    evaluating k zip_with folds per row; the Catalyst path remains as
    the no-Arrow reference and the parity test pins them equal."""
    import numpy as np
    import pandas as pd

    C = np.array(centroids, dtype=np.int64)
    cnorm = (C * C).sum(axis=1)

    def block(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf) == 0:
                out["__c"] = pd.Series([], dtype="int32")
                yield out
                continue
            # NULL vectors — and vectors CONTAINING a null element —
            # get a null assignment (a bare np.asarray would crash the
            # whole job on a null vector; Arrow surfaces null ELEMENTS
            # as NaN after the float conversion, so probe via isnan).
            # ONE float64 matrix serves both the null probe and the
            # int64 rebuild for clean rows — quantized magnitudes are
            # far below 2^53, so the float round-trip is lossless.
            # The Catalyst path's isNull/exists guard mirrors this.
            dim = C.shape[1]
            # the len(v) == dim guard also routes WRONG-DIMENSION
            # vectors to the null assignment — np.array over mixed
            # lengths is an inhomogeneous-shape crash (code-review r9)
            M = np.array(
                [
                    np.asarray(v, dtype="float64")
                    if v is not None and len(v) == dim
                    else np.full(dim, np.nan)
                    for v in pdf["qv"]
                ]
            )
            mask = ~np.isnan(M).any(axis=1)
            assign = pd.array([pd.NA] * len(pdf), dtype="Int32")
            if mask.any():
                V = M[mask].astype(np.int64)
                # ||v - c||^2 ranks identically to ||c||^2 - 2<v,c>
                # (the ||v||^2 term is constant per row) — int64, exact
                D = cnorm[None, :] - 2 * (V @ C.T)
                assign[mask] = np.argmin(D, axis=1).astype("int32")
            out["__c"] = assign
            yield out

    from pyspark.sql.types import IntegerType, StructField, StructType

    # build a FRESH StructType: StructType.add mutates the receiver,
    # and DataFrame.schema is a cached object — mutating it makes the
    # DataFrame itself appear to have the output column
    out_schema = StructType(
        list(qdf.schema.fields) + [StructField("__c", IntegerType())]
    )
    return qdf.mapInPandas(block, out_schema)


def _assign_sums_arrow(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Fused Lloyd's assignment + PER-BATCH PARTIAL AGGREGATION for the
    trainer (optimization r15, guide §4 shuffle-fewer-bytes across the
    Python boundary): instead of shipping every row's (id, qv, __c)
    back across Arrow and hash-aggregating N rows JVM-side, each batch
    returns at most k rows of (cluster, count, dim partial sums) —
    int64-exact numpy reductions, so the per-cluster TOTALS the caller
    aggregates are bit-identical to the row-at-a-time Sum(ElementAt)
    aggregate (integer addition is associative; np.argmin keeps the
    same first-minimum tie-break as the Catalyst fold).  Only the
    trainer may use this: rows with null/dirty vectors are DROPPED from
    the partials (the trainer pre-filters them out anyway), whereas
    :func:`_assign_exact_arrow` must surface them with a null code."""
    import numpy as np
    import pandas as pd

    C = np.array(centroids, dtype=np.int64)
    cnorm = (C * C).sum(axis=1)
    k, dim = C.shape

    def block(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.array(
                [
                    np.asarray(v, dtype="float64")
                    if v is not None and len(v) == dim
                    else np.full(dim, np.nan)
                    for v in pdf["qv"]
                ]
            )
            mask = ~np.isnan(M).any(axis=1)
            if not mask.any():
                continue
            V = M[mask].astype(np.int64)
            D = cnorm[None, :] - 2 * (V @ C.T)
            a = np.argmin(D, axis=1)
            counts = np.bincount(a, minlength=k)
            S = np.zeros((k, dim), dtype=np.int64)
            np.add.at(S, a, V)  # unbuffered int64 scatter-add: exact
            present = np.flatnonzero(counts)
            out = {"__c": present.astype("int32"),
                   "n": counts[present].astype("int64")}
            for i in range(dim):
                out[f"s{i}"] = S[present, i]
            yield pd.DataFrame(out)

    schema = "__c int, n long, " + ", ".join(f"s{i} long" for i in range(dim))
    # project to just the vector column BEFORE the boundary (§4.1:
    # Spark cannot see which columns the function touches)
    return qdf.select("qv").mapInPandas(block, schema)


def train_ivf_centroids_exact(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_arrow: bool = True,
) -> list[list[int]]:
    """Lloyd's k-means over 2^20-quantized integer vectors — every
    arithmetic step is exact and order-independent, so the trained
    centroids are BIT-IDENTICAL across engines, partitionings, and
    cluster sizes (the property the float path cannot give: double
    ``avg`` depends on partial-sum order).  This is what makes the IVF
    registry query value-checkable against a DuckDB oracle twin.

    * init: the k lowest-id vectors (no RNG),
    * assignment: integer squared-L2 argmin, ties to the lowest index,
    * update: bigint dimension sums (exact, any order) with the
      centroid as the FLOOR of the mean (``s // n`` on Python ints —
      the SQL twin uses ``(s - ((s%n)+n)%n) // n``), empty clusters
      keep their previous centroid.

    Distributed shape: the driver holds k x dim bigints; assignment and
    the per-(cluster, dim) sums are one shuffle of k x (dim + 1) cells
    per iteration, independent of corpus size.  The sums are a single
    WIDE aggregate (dim ``sum(element_at)`` columns) rather than a
    posexplode — the explode would shuffle dim rows per VECTOR
    (corpus x dim), the wide agg partially combines map-side and
    shuffles only k x (dim + 1) cells per mapper."""
    # NULL vectors (or vectors with a null ELEMENT) cannot seed or
    # update a centroid — drop them from training entirely
    # (assignment still gives them a NULL cluster)
    qdf = (
        df.select(F.col(id_col), ivf_quantize_expr(F.col(vec_col)).alias("qv"))
        .filter(F.col("qv").isNotNull())
        .filter(~F.exists(F.col("qv"), lambda x: x.isNull()))
    )
    init = qdf.orderBy(F.col(id_col)).limit(k).collect()
    centroids = [[int(v) for v in r["qv"]] for r in init]
    # fewer vectors than k: train with what exists (an empty input
    # returns [] — previously the update loop indexed centroids[j]
    # past the collected count and died with a bare IndexError)
    k = len(centroids)
    if k == 0:
        return []
    dim = len(centroids[0])  # k == 0 already returned above
    qdf = qdf.persist()
    try:
        for _ in range(iters):
            if use_arrow:
                # fused assignment + per-batch partial sums inside the
                # Arrow boundary (optimization r15): the shuffle and
                # the Python->JVM return carry <= batches x k partial
                # rows instead of the full corpus — bit-identical
                # totals (int64 addition is associative)
                sums = _assign_sums_arrow(qdf, centroids).groupBy("__c").agg(
                    F.expr("sum(n) AS n"),
                    *[F.expr(f"sum(s{i}) AS s{i}") for i in range(dim)],
                ).collect()
            else:
                assigned = qdf.withColumn(
                    "__c", _nearest_centroid_l2(F.col("qv"), centroids)
                )
                # agg columns via F.expr (optimization r14, guide §1.2
                # driver overhead): the F.sum(F.element_at(...)) loop
                # cost ~0.24 s of py4j round-trips per iteration at
                # dim=64; one parsed string per column is ~10x cheaper
                # and parses to the identical Count/Sum(ElementAt)
                # aggregates
                sums = assigned.groupBy("__c").agg(
                    F.expr("count(*) AS n"),
                    *[
                        F.expr(f"sum(element_at(qv, {i + 1})) AS s{i}")
                        for i in range(dim)
                    ],
                ).collect()
            new = {
                int(r["__c"]): [int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)]
                for r in sums  # qdf is pre-filtered: no null clusters here
            }
            centroids = [new.get(j, centroids[j]) for j in range(k)]
    finally:
        qdf.unpersist()
    return centroids


def _nprobe_lists(centroids: list[list[int]], qq: list[int], nprobe: int) -> list[int]:
    """The nprobe nearest coarse lists to a quantized query by exact
    integer squared-L2, lowest-index tie-break — the driver-side probe
    selection shared by ivf_topk_exact and ivfpq_topk_persisted."""

    def sqdist(c: list[int]) -> int:
        return sum((a - b) * (a - b) for a, b in zip(qq, c))

    return sorted(range(len(centroids)), key=lambda j: (sqdist(centroids[j]), j))[
        :nprobe
    ]


def ivf_assign_exact(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Attach the integer-exact coarse-quantizer cluster id (Arrow
    int64-matmul fast path by default; identical output either way —
    see :func:`_assign_exact_arrow`)."""
    if use_arrow:
        qdf = df.withColumn("qv", ivf_quantize_expr(F.col(vec_col)))
        return (
            _assign_exact_arrow(qdf, centroids)
            .withColumnRenamed("__c", "ivf_cluster")
            .drop("qv")
        )
    # eligibility guard keeps the two paths identical: a NULL vector,
    # one containing a null ELEMENT, or one with an out-of-range /
    # non-finite element (which quantizes to a NULL element — see
    # ivf_quantize_expr) gets a NULL cluster on both (struct-min over
    # null distances would otherwise pick an arbitrary index here, and
    # the Arrow path masks such rows via the NaN probe)
    qv = ivf_quantize_expr(F.col(vec_col))
    clean = F.col(vec_col).isNotNull() & ~F.exists(qv, lambda x: x.isNull())
    return df.withColumn(
        "ivf_cluster",
        F.when(clean, _nearest_centroid_l2(qv, centroids)),
    )


def ivf_topk_exact(
    df: DataFrame,
    centroids: list[list[int]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """ANN search with the integer-exact quantizer: probe the nprobe
    nearest lists by integer squared-L2 (driver-side on exact Python
    ints), exact float cosine re-rank inside them (the fold already
    proven bit-identical by the brute-force oracle)."""
    probe = _nprobe_lists(centroids, quantize_query_or_raise(query_vec), nprobe)
    assigned = ivf_assign_exact(df, centroids, vec_col)
    candidates = assigned.filter(F.col("ivf_cluster").isin(probe)).drop("ivf_cluster")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col, exclude_ids)


def _centroid_literal(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])


def _nearest_centroid(vec_col: Column, centroids: list[list[float]], dim: int) -> Column:
    """argmin over centroid literals by cosine distance — an
    array_min over (dist, idx) structs, fully JVM-side."""
    import math

    nv = _norm(vec_col, dim)
    entries = []
    for i, c in enumerate(centroids):
        nc = math.sqrt(sum(x * x for x in c)) or 1.0
        # try_divide: a zero-norm vector makes every cosine NULL (not
        # an ANSI DIVIDE_BY_ZERO job kill); coalesce to distance 1.0
        # so such rows still get a deterministic nearest cluster
        dist = F.lit(1.0) - F.coalesce(
            F.try_divide(
                _dot(vec_col, _centroid_literal(c), dim), nv * F.lit(nc)
            ),
            F.lit(0.0),
        )
        entries.append(F.struct(dist.alias("dist"), F.lit(i).alias("idx")))
    return F.array_min(F.array(*entries))["idx"]


def train_ivf_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's k-means as an iterative DataFrame algorithm: the driver
    loop holds only k centroid vectors; assignment and the per-cluster
    mean are distributed (posexplode + groupBy avg — one shuffle of
    k x dim cells per iteration, independent of corpus size).
    Deterministic: init = the k lowest-id vectors, no RNG."""
    # drop NULL vectors / null-element vectors from training — they
    # cannot seed or update a centroid (same guard as the integer
    # twin train_ivf_centroids_exact; float(None) died here before)
    clean = df.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    )
    init = clean.orderBy(F.col(id_col)).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    # fewer vectors than k: train with what exists (the update loop
    # previously indexed centroids[i] past the collected count —
    # the exact same IndexError the integer twin fixed)
    k = len(centroids)
    if k == 0:
        return []
    dim = len(centroids[0])
    slim = clean.select(F.col(id_col), F.col(vec_col)).persist()
    try:
        for _ in range(iters):
            assigned = slim.withColumn(
                "__c", _nearest_centroid(F.col(vec_col), centroids, dim)
            )
            pos = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("pos")
            means = (
                assigned.select("__c", pos, F.col(vec_col))
                .withColumn("val", F.element_at(F.col(vec_col), F.col("pos")).cast("double"))
                .groupBy("__c", "pos")
                .agg(F.avg("val").alias("m"))
                .groupBy("__c")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("arr"))
                .select("__c", F.transform("arr", lambda s: s["m"]).alias("centroid"))
                .collect()
            )
            new = {r["__c"]: [float(x) for x in r["centroid"]] for r in means}
            # empty clusters keep their previous centroid
            centroids = [new.get(i, centroids[i]) for i in range(k)]
    finally:
        slim.unpersist()
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the coarse-quantizer cluster id (the IVF list key)."""
    # dim is unused by the fold-based distance exprs — no _infer_dim
    # job on the assignment hot path (r9 review)
    return df.withColumn(
        "ivf_cluster", _nearest_centroid(F.col(vec_col), centroids, None)
    )


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """ANN search: probe the ``nprobe`` nearest IVF lists, exact
    cosine re-rank inside them.  At scale the assignment column is
    precomputed/persisted (partition by ivf_cluster) so a query scans
    only ~nprobe/k of the corpus."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos_to_q(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    probe = sorted(range(len(centroids)), key=lambda i: (-cos_to_q(centroids[i]), i))[
        :nprobe
    ]
    assigned = ivf_assign(df, centroids, vec_col)
    candidates = assigned.filter(F.col("ivf_cluster").isin(probe)).drop("ivf_cluster")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col, exclude_ids)


# ----------------------------------------------------------------------
# int8 scalar quantization (storage-reduction path for embeddings)
# ----------------------------------------------------------------------
def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale =
    127 / max|x|, q_i = floor(x_i * scale).  A float32 corpus shrinks
    4x (the standard first step before IVF/PQ at 100 TB scale);
    dequantization is q_i / scale.  ``floor`` (not round) so the
    arithmetic is a single unambiguous IEEE op chain any engine
    reproduces bit-for-bit.  Zero vectors are dropped (no scale).

    Returns (id, qvec array<int>, scale double)."""
    absmax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), absmax.alias("__am"))
        .filter(F.col("__am") > 0)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * (F.lit(127.0) / F.col("__am"))).cast(
                    "int"
                ),
            ).alias("qvec"),
            (F.lit(127.0) / F.col("__am")).alias("scale"),
        )
    )


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """array<double> of q_i / scale — the lossy reconstruction."""
    return F.transform(qvec, lambda q: q.cast("double") / scale)


# ----------------------------------------------------------------------
# IVF index persistence: centroids sidecar + ivf_cluster partitioning
# ----------------------------------------------------------------------
def write_ivf_index(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: rows Parquet-partitioned by
    ``ivf_cluster`` (so a probe prunes partitions instead of scanning
    and re-assigning the corpus) plus a centroid sidecar JSON.  This is
    the ROADMAP #3 scale contract: assignment cost is paid once at
    build, a query reads only ~nprobe/k of the data."""
    import json
    import os

    assigned = ivf_assign(df, centroids, vec_col)
    (
        assigned.repartition("ivf_cluster")
        .write.mode("overwrite")
        .partitionBy("ivf_cluster")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(centroids, f)


def read_ivf_centroids(path: str) -> list[list[float]]:
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        return json.load(f)


def write_exact_centroids(path: str, centroids: list[list[int]]) -> None:
    """Persist integer-exact k-means centroids (the
    :func:`train_ivf_centroids_exact` output) as a standalone JSON
    sidecar.  Training is the only corpus-sized cost in SemDedup /
    prototypicality scoring; persisting the k x dim ints makes
    re-curation of a grown corpus incremental (and, because every
    downstream step is integer-exact, bit-identical to retraining on
    the original snapshot).  Atomic rename so a concurrent reader
    never sees a torn file."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump([[int(x) for x in c] for c in centroids], f)
    os.replace(tmp, path)


def read_exact_centroids(path: str) -> list[list[int]]:
    import json

    with open(path) as f:
        return [[int(x) for x in c] for c in json.load(f)]


def ivf_topk_persisted(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """ANN search against a persisted IVF index: the ``ivf_cluster``
    partition filter prunes non-probed lists at the source (check the
    plan's PartitionFilters), then the exact re-rank runs only on
    ~nprobe/k of the corpus.  No per-query re-assignment."""
    import math

    centroids = read_ivf_centroids(path)
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos_to_q(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    probe = sorted(range(len(centroids)), key=lambda i: (-cos_to_q(centroids[i]), i))[
        :nprobe
    ]
    df = spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe))
    return cosine_topk(df.drop("ivf_cluster"), query_vec, k, vec_col, id_col, exclude_ids)


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a seed —
    a small LCG so the planes are reproducible across sessions with
    no RNG dependency."""
    vals = []
    state = (seed * 2654435761 + 1013904223) & 0xFFFFFFFF
    for _ in range(dim):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        vals.append((state / 2**31) - 1.0)  # [-1, 1)
    return vals

def lsh_bucket_expr(vec_col: Column | str, dim: int, num_planes: int = 16) -> Column:
    """The LSH bucket as a pure Catalyst expression: sign pattern of
    ``num_planes`` deterministic hyperplane projections packed into a
    long.  Usable as a ``withColumn`` (no join, no shuffle) — the
    quantizer-derived block key for blocked near-dup at scale.

    Built as ONE parsed SQL expression (optimization r14): the old
    per-element ``F.lit`` loop cost ~2.5 s of py4j round-trips per
    call (num_planes * dim literals plus the fold lambdas) — pure
    driver latency repeated on every query construction.  The parsed
    tree is operator-identical (same zip_with/aggregate fold, same
    left-assoc bigint sum), pinned by test_lsh_bucket_expr_sql_twin.
    The fast path needs the column as SQL text, so it applies to
    ``str`` input only (Spark 4 classic has no stable Column→SQL API)
    and only to plain-identifier names — a name needing backticks
    (spaces, dots, reserved words) would parse wrong or not at all
    (ADVICE r14), so it falls back to the Column loop like any other
    non-str input."""
    if isinstance(vec_col, str) and vec_col.isidentifier():
        terms = ["CAST(0 AS BIGINT)"]
        for p in range(num_planes):
            dot = _dot_fold_sql(vec_col, _lit_double_array_sql(_hyperplane(p, dim)))
            terms.append(
                f"(CASE WHEN {dot} >= 0 THEN CAST({1 << p} AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)"
            )
        return F.expr(" + ".join(terms))
    if isinstance(vec_col, str):
        # backtick-quote so a dotted name resolves as the literal
        # column, not a struct-field path (bare F.col("a.b") would)
        vec_col = F.col("`" + vec_col.replace("`", "``") + "`")
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(v).cast("double") for v in _hyperplane(p, dim)])
        bit = F.when(_dot(vec_col, plane, dim) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_cosine_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane sketch: one integer bucket from the sign
    pattern of ``num_planes`` projections.  Join on the bucket to get
    candidate pairs at scale."""
    return df.select(
        F.col(id_col), lsh_bucket_expr(vec_col, dim, num_planes).alias("bucket")
    )


# ----------------------------------------------------------------------
# SemDedup: semantic deduplication inside coarse embedding clusters
# ----------------------------------------------------------------------
def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    use_blas: bool = True,
    tile_rows: int = 1024,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDedup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with the INTEGER-EXACT
    k-means coarse quantizer, then inside each cluster drop every
    vector whose cosine to a LOWER-id cluster member reaches the
    threshold (the paper's keep-one-representative policy, with the
    deterministic lowest-id representative instead of
    distance-to-centroid).  Returns one row per input vector:
    ``(id, cid, keep)``.

    Why this shape scales: the cluster key bounds the quadratic term
    exactly as in the paper — at corpus scale k grows with N so the
    expected cluster stays ~1-10k vectors, and the only full-data
    movement is one shuffle on the cluster id.  Training cost is
    independent of corpus size per iteration (k x (dim+1) cells per
    mapper, see :func:`train_ivf_centroids_exact`); the within-cluster
    comparison is one Arrow batch + tiled BLAS matmul per cluster
    (``tile_rows`` bounds the score-matrix slab so memory is
    O(tile_rows x cluster), not cluster^2).

    Cross-engine determinism: assignments are integer-exact (bit-
    identical in any engine); cosines are ROUNDED to ``round_digits``
    before the threshold test, the same convention as
    :func:`cosine_pairs_blocked_numpy`, so BLAS vs sequential-fold
    summation (~1e-15 apart) cannot disagree on membership.

    ``use_blas=False`` runs the same semantics as a Catalyst
    cluster-equi-self-join — the no-Arrow reference path the parity
    test pins against the BLAS default.

    ``centroids`` (quantized-integer, as produced by
    :func:`train_ivf_centroids_exact` or loaded via
    :func:`read_exact_centroids`) skips training entirely — the
    incremental path: train once on a corpus snapshot, persist the
    k x dim ints, and re-run dedup/curation on grown corpora without
    re-paying the Lloyd's iterations.  Because assignment is
    integer-exact, a run with passed-in centroids is bit-identical to
    the run that trained them.
    """
    import numpy as np
    import pandas as pd

    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids_exact(
            df, k=k, iters=iters, vec_col=vec_col, id_col=id_col
        )
    )
    assigned = ivf_assign_exact(df, cents, vec_col=vec_col).select(
        id_col, vec_col, "ivf_cluster"
    )

    if not use_blas:
        a, b = assigned.alias("a"), assigned.alias("b")
        cos = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        # NaN guard: a zero-norm vector gives cosine 0/0 = NaN, and
        # Spark orders NaN ABOVE every number, so a bare `>=` would
        # call the pair similar — numpy (NaN >= t is False) and the
        # SQL oracle (0/0 -> NULL, filtered) both say NOT similar;
        # make the reference path agree
        dup = (
            a.join(
                b,
                (F.col("a.ivf_cluster") == F.col("b.ivf_cluster"))
                & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
            )
            .filter(
                F.coalesce(
                    F.when(~F.isnan(cos), F.round(cos, round_digits) >= threshold),
                    F.lit(False),
                )
            )
            .select(F.col(f"a.{id_col}").alias(id_col))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        return (
            assigned.join(dup, on=id_col, how="left")
            .select(
                id_col,
                F.col("ivf_cluster").cast("int").alias("cid"),
                F.col("__dup").isNull().alias("keep"),
            )
        )

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        if n >= 2:
            M = np.array([np.asarray(e, dtype=np.float64) for e in pdf[vec_col]])
            # zero-norm rows normalize to NaN; every comparison against
            # NaN is False, so such rows keep (never "similar") — the
            # errstate only silences the expected divide warning
            with np.errstate(divide="ignore", invalid="ignore"):
                Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            for i0 in range(1, n, tile_rows):
                i1 = min(i0 + tile_rows, n)
                # rows [i0, i1) against every EARLIER column (< row idx)
                S = np.round(Mn[i0:i1] @ Mn[:i1].T, round_digits)
                for r in range(i0, i1):
                    if (S[r - i0, :r] >= threshold).any():
                        keep[r] = False
        return pd.DataFrame(
            {
                id_col: ids,
                "cid": pdf["ivf_cluster"].to_numpy().astype("int32"),
                "keep": keep,
            }
        )

    # NULL clusters (null vectors / null-element vectors get no
    # assignment) cannot enter the Arrow blocks: astype('int32') on
    # the null key and np.array over None vectors both kill the job.
    # Route them around the matmul with keep=True / cid=NULL — the
    # exact same answer the use_blas=False reference path gives them
    # (code-review r9; the two paths are parity-pinned)
    nulls = assigned.filter(F.col("ivf_cluster").isNull()).select(
        F.col(id_col),
        F.lit(None).cast("int").alias("cid"),
        F.lit(True).alias("keep"),
    )
    deduped = (
        assigned.filter(F.col("ivf_cluster").isNotNull())
        .groupBy("ivf_cluster")
        .applyInPandas(block, f"{id_col} long, cid int, keep boolean")
    )
    return deduped.unionByName(nulls)


def centroid_distances(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Prototypicality scoring (the SSL-prototypes data-pruning metric,
    Sorscher et al. 2022, arXiv:2206.14486): each vector's squared L2
    distance to its assigned cluster centroid, in the 2^20-quantized
    integer space — low distance = prototypical/easy example, high
    distance = outlier — the ranking a pruning pipeline keeps or drops
    percentiles of.  Returns ``(id, cid, sqdist)`` with ``sqdist`` an
    EXACT bigint (no float accumulation at all), so the whole score
    column is bit-identical across engines and partitionings.

    Plan shape: training is corpus-size-independent per iteration
    (see :func:`train_ivf_centroids_exact`), assignment is one Arrow
    matmul pass, and the distance is a map-side fold against the
    BROADCAST k-row centroid table — no data-sized shuffle anywhere.
    """
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids_exact(
            df, k=k, iters=iters, vec_col=vec_col, id_col=id_col
        )
    )
    qdf = df.select(F.col(id_col), ivf_quantize_expr(F.col(vec_col)).alias("qv"))
    assigned = _assign_exact_arrow(qdf, cents)
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(i, [int(x) for x in c]) for i, c in enumerate(cents)],
        "cid int, cv array<long>",
    )
    diffs = F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y))
    return (
        assigned.join(F.broadcast(cdf), assigned["__c"] == cdf["cid"])
        .select(
            F.col(id_col),
            F.col("cid"),
            F.aggregate(diffs, F.lit(0).cast("long"), lambda a, d: a + d).alias(
                "sqdist"
            ),
        )
    )


def topic_balanced_sample(
    df: DataFrame,
    total: int = 256,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster-balanced prototype-first sampling — the topic-rebalance
    curation pass (DataComp/SemDeDup-era recipe: cluster the corpus,
    take a per-cluster quota, prefer prototypical examples): k-means
    clusters via the integer-exact Lloyd's trainer, an INTEGER
    proportional quota per cluster (floor(total * n_c / N), so the
    plan is bit-exact cross-engine), and within each cluster the
    quota's MOST PROTOTYPICAL members (lowest integer squared L2 to
    the centroid, ties to the lowest id — the Sorscher et al. 2022
    easy-first ranking).

    Returns the kept rows (id, cid, sqdist, rank) — rank 1-based
    within the cluster.

    Scale shape: scoring is the broadcast-centroid map-side fold of
    :func:`centroid_distances`; the quota table is k rows computed
    from a k-row count aggregate (broadcast back); selection is one
    window partitioned by cluster id — k partitions whose skew is
    bounded by cluster sizes (at extreme scale swap the window for a
    per-cluster distance-threshold join; the quota rule is unchanged).
    """
    scored = centroid_distances(
        df, k=k, iters=iters, vec_col=vec_col, id_col=id_col
    )
    from pyspark.sql import Window

    counts = scored.groupBy("cid").agg(F.count("*").alias("__n"))
    # corpus total via an all-rows window over the K-ROW count table
    # (k cells through one task — not a data-sized global window, and
    # no cross join).  NOTE the distinct name: Spark resolves columns
    # case-insensitively, so "__N" would silently REPLACE "__n"
    quotas = counts.withColumn(
        "__tot", F.sum("__n").over(Window.partitionBy(F.lit(1)))
    ).select(
        "cid",
        F.expr(f"cast(({int(total)} * __n) div __tot as long)").alias("__quota"),
    )

    w = Window.partitionBy("cid").orderBy(F.col("sqdist").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(quotas), on="cid")
        .filter(F.col("rank") <= F.col("__quota"))
        .select(id_col, "cid", "sqdist", "rank")
    )


# ======================================================================
# product quantization (Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search")
# ======================================================================

#: number of PQ subquantizers — 4 x 16-dim subspaces for the 64-dim
#: test embeddings; at production dims (1k+) m scales up so each code
#: stays one byte (k <= 256).
PQ_M = 4


def train_pq_codebooks_exact(
    df: DataFrame,
    m: int = PQ_M,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_arrow: bool = True,
    fused: bool = True,
) -> list[list[list[int]]]:
    """Train the m per-subspace codebooks of a product quantizer with
    the INTEGER-EXACT Lloyd's step on each dim/m-wide vector slice
    (2^20-quantized bigint arithmetic, so the codebooks are
    bit-identical across engines and partitionings, which is what lets
    the whole PQ pipeline be value-checked against a DuckDB twin).

    ``fused=True`` (default) trains all m subspaces in ONE pass per
    iteration: a single Arrow assignment computes every subspace's
    code, and a single groupBy on the joint code tuple (<= k^m combo
    rows carrying full-dim sums) replaces m per-subspace aggregates;
    the per-subspace marginals are folded driver-side in exact Python
    ints.  Identical output to ``fused=False`` (m independent
    train_ivf_centroids_exact runs — the reference path, pinned by
    test) at m*(iters+1) -> 3 Spark jobs.  The combo table is k^m rows
    max — fine for (k=8, m=4); for big k*m fall back to fused=False.

    Null policy (both paths): a vector with a null element in ANY
    position is excluded from training entirely — the non-fused path
    pre-filters to fully-clean vectors before slicing so the two
    paths cannot diverge on partially-null corpora (training a
    subspace on a row whose OTHER subspace is null would give the
    flags different codebooks).  Encoding still gives such rows NULL
    codes in every subspace (pq_encode_exact).

    PQ is the memory side of billion-scale ANN: m codes of log2(k)
    bits replace the float vector (64 x f32 = 256 B -> 4 B here), so a
    100-TB embedding corpus compresses to a RAM-resident code table
    while search cost drops to table lookups (see pq_adc_topk).

    Distributed shape: per subspace, training shuffles k x (sub_dim+1)
    cells per iteration independent of corpus size; the driver holds
    m x k x sub_dim bigints.  The m trainings scan the corpus each —
    at scale you'd cache the sliced projection once; the trainer
    persists its own quantized input per call."""
    dim = _infer_dim(df, vec_col)
    if dim is None or dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    if not fused:
        # pre-filter to FULLY-eligible vectors (see null policy
        # above): without this, a row dirty only in subspace 0 would
        # still train subspaces 1..m-1 here while the fused path drops
        # it.  Eligibility is probed on the QUANTIZED full vector so
        # the new dirty classes (NaN / Inf / |x| > EXACT_MAX_ABS,
        # which ivf_quantize_expr nulls) are excluded exactly like the
        # fused path and the oracle's elig_expr='embedding' chains —
        # a raw-null check alone let a 1e30-element row train the
        # clean subspaces (code-review r9, second pass).
        qfull = ivf_quantize_expr(F.col(vec_col))
        clean = df.filter(
            F.col(vec_col).isNotNull()
            & ~F.exists(qfull, lambda x: x.isNull())
        )
        return [
            train_ivf_centroids_exact(
                clean.select(
                    F.col(id_col),
                    F.slice(F.col(vec_col), s * sub + 1, sub).alias(vec_col),
                ),
                k=k,
                iters=iters,
                vec_col=vec_col,
                id_col=id_col,
                use_arrow=use_arrow,
            )
            for s in range(m)
        ]
    # fused path: identical math, 3 jobs total instead of m * (iters+1).
    qdf = (
        df.select(F.col(id_col), ivf_quantize_expr(F.col(vec_col)).alias("qv"))
        .filter(F.col("qv").isNotNull())
        .filter(~F.exists(F.col("qv"), lambda x: x.isNull()))
    )
    init = qdf.orderBy(F.col(id_col)).limit(k).collect()
    if not init:
        return [[] for _ in range(m)]
    k = len(init)
    books = [
        [[int(v) for v in r["qv"][s * sub : (s + 1) * sub]] for r in init]
        for s in range(m)
    ]
    qdf = qdf.persist()
    try:
        for _ in range(iters):
            # ONE combo aggregate replaces m per-subspace aggregates:
            # group on the m code columns jointly (<= k^m combo rows,
            # each carrying the full dim sums + count), then fold the
            # per-subspace marginals driver-side in exact Python ints —
            # bit-identical to training each subspace separately.  The
            # per-batch partials are computed INSIDE the Arrow boundary
            # (optimization r15, same move as _assign_sums_arrow) so
            # the Python->JVM return is combo-sized, not corpus-sized.
            combos = _assign_pq_sums_arrow(qdf, books, sub).groupBy(
                *[f"__c{s}" for s in range(m)]
            ).agg(
                F.expr("sum(n) AS n"),
                *[F.expr(f"sum(s{i}) AS s{i}") for i in range(dim)],
            ).collect()
            sums = [
                [[0] * sub for _ in range(k)] for _ in range(m)
            ]
            ns = [[0] * k for _ in range(m)]
            for r in combos:
                cnt = int(r["n"])
                for s in range(m):
                    j = int(r[f"__c{s}"])
                    ns[s][j] += cnt
                    row = sums[s][j]
                    for i in range(sub):
                        row[i] += int(r[f"s{s * sub + i}"])
            books = [
                [
                    [x // ns[s][j] for x in sums[s][j]]
                    if ns[s][j]
                    else books[s][j]
                    for j in range(k)
                ]
                for s in range(m)
            ]
    finally:
        qdf.unpersist()
    return books


def _assign_pq_sums_arrow(
    qdf: DataFrame, books: list[list[list[int]]], sub: int
) -> DataFrame:
    """Fused PQ assignment + per-batch partial combo aggregation
    (optimization r15; the trainer twin of :func:`_assign_sums_arrow`):
    each batch returns one row per OCCUPIED code combo — the m subspace
    codes, the member count, and the full-dim int64 partial sums —
    instead of every input row.  Rows with null/dirty vectors are
    dropped (trainer input is pre-filtered); all arithmetic is exact
    int64, so the aggregated totals are bit-identical to summing
    row-at-a-time."""
    import numpy as np
    import pandas as pd

    mats = [np.array(b, dtype=np.int64) for b in books]
    norms = [(C * C).sum(axis=1) for C in mats]
    m = len(books)
    k = len(books[0])
    dim = m * sub

    def block(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.array(
                [
                    np.asarray(v, dtype="float64")
                    if v is not None and len(v) == dim
                    else np.full(dim, np.nan)
                    for v in pdf["qv"]
                ]
            )
            mask = ~np.isnan(M).any(axis=1)
            if not mask.any():
                continue
            V = M[mask].astype(np.int64)
            codes = []
            for s, (C, cn) in enumerate(zip(mats, norms)):
                Vs = V[:, s * sub : (s + 1) * sub]
                D = cn[None, :] - 2 * (Vs @ C.T)
                codes.append(np.argmin(D, axis=1))
            key = codes[0].astype(np.int64)
            for s in range(1, m):
                key = key * k + codes[s]
            uniq, inv = np.unique(key, return_inverse=True)
            counts = np.bincount(inv)
            S = np.zeros((len(uniq), dim), dtype=np.int64)
            np.add.at(S, inv, V)
            out = {}
            rem = uniq.copy()
            for s in range(m - 1, -1, -1):
                out[f"__c{s}"] = (rem % k).astype("int32")
                rem = rem // k
            out["n"] = counts.astype("int64")
            for i in range(dim):
                out[f"s{i}"] = S[:, i]
            yield pd.DataFrame(out)

    schema = (
        ", ".join(f"__c{s} int" for s in range(m))
        + ", n long, "
        + ", ".join(f"s{i} long" for i in range(dim))
    )
    return qdf.select("qv").mapInPandas(block, schema)


def _assign_pq_arrow(qdf: DataFrame, books: list[list[list[int]]], sub: int) -> DataFrame:
    """Arrow fast path assigning ALL m subspace codes in one pass —
    per batch, m small int64 matmuls (same exact arithmetic and
    lowest-index tie-break as _assign_exact_arrow, which remains the
    single-codebook reference).  NULL vectors — or vectors containing
    a null element — get NULL codes in every subspace (same float64
    NaN-probe masking as _assign_exact_arrow)."""
    import numpy as np
    import pandas as pd

    mats = [np.array(b, dtype=np.int64) for b in books]
    norms = [(C * C).sum(axis=1) for C in mats]
    dim = len(books) * sub

    def block(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf) == 0:
                for s in range(len(mats)):
                    out[f"__c{s}"] = pd.Series([], dtype="Int32")
                yield out
                continue
            M = np.array(
                [
                    np.asarray(v, dtype="float64")
                    if v is not None and len(v) == dim
                    else np.full(dim, np.nan)
                    for v in pdf["qv"]
                ]
            )
            mask = ~np.isnan(M).any(axis=1)
            for s, (C, cn) in enumerate(zip(mats, norms)):
                assign = pd.array([pd.NA] * len(pdf), dtype="Int32")
                if mask.any():
                    V = M[mask][:, s * sub : (s + 1) * sub].astype(np.int64)
                    D = cn[None, :] - 2 * (V @ C.T)
                    assign[mask] = np.argmin(D, axis=1).astype("int32")
                out[f"__c{s}"] = assign
            yield out

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(qdf.schema.fields)
        + [StructField(f"__c{s}", IntegerType()) for s in range(len(books))]
    )
    return qdf.mapInPandas(block, out_schema)


def pq_encode_exact(
    df: DataFrame,
    books: list[list[list[int]]],
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Attach the m PQ codes (``pq_code_0..m-1``): per subspace, the
    integer-exact squared-L2 argmin over that subspace's codebook
    (lowest-index tie-break, matching np.argmin and the oracle's
    row_number order).  Map-side, zero shuffle; NULL vectors (or
    vectors with a null element) get NULL codes like ivf_assign_exact.

    Arrow by default — one int64 matmul per subspace per batch; the
    Catalyst fold path (m*k zip_with folds per row) remains as the
    no-Arrow reference and the parity test pins them equal."""
    sub = len(books[0][0])
    if use_arrow:
        qdf = df.withColumn("qv", ivf_quantize_expr(F.col(vec_col)))
        out = _assign_pq_arrow(qdf, books, sub).drop("qv")
        for s in range(len(books)):
            out = out.withColumnRenamed(f"__c{s}", f"pq_code_{s}")
        return out
    # eligibility mirrors ivf_assign_exact: dirty elements (null /
    # non-finite / out-of-range) quantize to NULL, so probing the
    # FULL-vector quantization catches them all in one pass
    qfull = ivf_quantize_expr(F.col(vec_col))
    clean = F.col(vec_col).isNotNull() & ~F.exists(qfull, lambda x: x.isNull())
    out = df
    for s, book in enumerate(books):
        qsub = ivf_quantize_expr(F.slice(F.col(vec_col), s * sub + 1, sub))
        out = out.withColumn(
            f"pq_code_{s}", F.when(clean, _nearest_centroid_l2(qsub, book))
        )
    return out


def pq_adc_topk(
    df: DataFrame,
    books: list[list[list[int]]],
    query_vec: list[float],
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays exact while
    corpus vectors are represented by their PQ codes.  The m x k
    distance table (query subvector -> every codebook entry, integer
    squared L2 on exact Python ints) is computed driver-side and rides
    the plan as literals; per row the approximate distance is m table
    lookups + (m-1) integer adds, then TakeOrderedAndProject keeps the
    global top-k without a full sort.

    This is the serving shape of PQ at scale: the scan reads only the
    code columns (4 B/vector instead of 256 B), distance evaluation
    does no float math at all, and the only cross-partition traffic is
    the per-task top-k heap merge.  Integer arithmetic end to end —
    bit-identical cross-engine, ties broken by id for a total order.

    Returns (id, adc_dist, rank), ascending distance."""
    enc = pq_encode_exact(df, books, vec_col)
    return _adc_rank(enc, _adc_tables(books, query_vec), topk, id_col, exclude_ids)


def _adc_tables(books: list[list[list[int]]], query_vec: list[float]) -> list[list[int]]:
    """The m x k asymmetric distance table: integer squared L2 from the
    quantized query subvector to every codebook entry, on exact Python
    ints — shared by every ADC entry point so the arithmetic cannot
    diverge between the live and persisted paths."""
    sub = len(books[0][0])
    qq = quantize_query_or_raise(query_vec)
    return [
        [
            sum((a - b) * (a - b) for a, b in zip(qq[s * sub : (s + 1) * sub], c))
            for c in book
        ]
        for s, book in enumerate(books)
    ]


def _adc_rank(
    coded: DataFrame,
    tables: list[list[int]],
    topk: int,
    id_col: str,
    exclude_ids: list[int] | None,
) -> DataFrame:
    """Rank rows carrying ``pq_code_*`` columns by the plan-literal
    distance-table lookups: m element_at + (m-1) integer adds per row,
    TakeOrderedAndProject for the top-k, (adc_dist asc, id asc) total
    order — the ONE ranking implementation behind pq_adc_topk,
    pq_adc_topk_persisted and ivfpq_topk_persisted."""
    adc = None
    for s, tbl in enumerate(tables):
        # try_element_at, NOT element_at: on the pinned Spark a NULL
        # index (NULL pq code from a null/dirty vector) makes
        # element_at return the LAST array element — a bogus but
        # valid-looking distance that ranks dirty rows among real
        # neighbors; try_element_at gives NULL, and the isNotNull
        # filter below drops those rows from the ranking entirely
        t = F.try_element_at(
            F.array(*[F.lit(int(d)).cast("long") for d in tbl]),
            (F.col(f"pq_code_{s}") + F.lit(1)).cast("int"),
        )
        adc = t if adc is None else adc + t
    scored = coded.select(F.col(id_col), adc.cast("long").alias("adc_dist"))
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    # rows with NULL codes (null vectors / null elements from
    # pq_encode_exact) have NULL adc_dist — plain asc() is NULLS FIRST
    # in Spark, so they would crowd ranks 1..m out of every top-k
    # (code-review r9); they are not comparable, drop them
    scored = scored.filter(F.col("adc_dist").isNotNull())
    order = [F.col("adc_dist").asc(), F.col(id_col).asc()]
    top = scored.orderBy(*order).limit(topk)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col(id_col),
        F.col("adc_dist").cast("bigint").alias("adc_dist"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def write_pq_index(
    df: DataFrame,
    books: list[list[list[int]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the PQ index: (id, pq_code_0..m-1) ONLY — the float
    vectors are deliberately NOT stored, because the whole point of PQ
    at 100 TB is that the serving scan touches m small ints per vector
    (4 B here) instead of the embedding (256 B).  Codebooks ride a
    JSON sidecar (atomic rename), so a search session needs no
    training pass and no corpus re-encode."""
    import json
    import os

    enc = pq_encode_exact(df, books, vec_col)
    code_cols = [f"pq_code_{s}" for s in range(len(books))]
    enc.select(F.col(id_col), *code_cols).write.mode("overwrite").parquet(path)
    tmp = os.path.join(path, "_pq_codebooks.json.tmp")
    with open(tmp, "w") as f:
        json.dump([[[int(x) for x in c] for c in b] for b in books], f)
    os.replace(tmp, os.path.join(path, "_pq_codebooks.json"))


def read_pq_codebooks(path: str) -> list[list[list[int]]]:
    import json
    import os

    with open(os.path.join(path, "_pq_codebooks.json")) as f:
        return [[[int(x) for x in c] for c in b] for b in json.load(f)]


def pq_adc_topk_persisted(
    spark,
    path: str,
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """ADC top-k against a persisted PQ index: reads ONLY the code
    columns (the plan's ReadSchema is m ints + the id — pinned by
    test), builds the query's distance table driver-side from the
    sidecar codebooks, and ranks by plan-literal lookups.  Identical
    ranking to :func:`pq_adc_topk` on the same codebooks (the codes
    are deterministic), without the training or encode cost."""
    books = read_pq_codebooks(path)
    df = spark.read.parquet(path)
    return _adc_rank(df, _adc_tables(books, query_vec), topk, id_col, exclude_ids)


def write_ivfpq_index(
    df: DataFrame,
    centroids: list[list[int]],
    books: list[list[list[int]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the IVF-PQ index — the canonical billion-scale ANN
    layout (FAISS IndexIVFPQ): rows carry ONLY (id, pq codes),
    Parquet-partitioned by the integer-exact coarse cluster.  A query
    therefore gets BOTH scale levers in one plan: partition pruning
    cuts the scan to ~nprobe/k of the corpus, and the pruned scan
    reads m bytes of codes per vector instead of the embedding.
    Coarse centroids + codebooks ride one JSON sidecar (atomic
    rename); the corpus embedding column is not stored at all."""
    import json
    import os

    enc = pq_encode_exact(ivf_assign_exact(df, centroids, vec_col), books, vec_col)
    code_cols = [f"pq_code_{s}" for s in range(len(books))]
    (
        enc.select(F.col(id_col), F.col("ivf_cluster"), *code_cols)
        .repartition("ivf_cluster")
        .write.mode("overwrite")
        .partitionBy("ivf_cluster")
        .parquet(path)
    )
    tmp = os.path.join(path, "_ivfpq_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "centroids": [[int(x) for x in c] for c in centroids],
                "books": [[[int(x) for x in c] for c in b] for b in books],
            },
            f,
        )
    os.replace(tmp, os.path.join(path, "_ivfpq_meta.json"))


def read_ivfpq_meta(path: str) -> tuple[list[list[int]], list[list[list[int]]]]:
    import json
    import os

    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    return (
        [[int(x) for x in c] for c in meta["centroids"]],
        [[[int(x) for x in c] for c in b] for b in meta["books"]],
    )


def ivfpq_topk_persisted(
    spark,
    path: str,
    query_vec: list[float],
    topk: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """ADC top-k against a persisted IVF-PQ index: probe the nprobe
    nearest coarse lists by integer L2 driver-side (exact Python
    ints, same tie-break as training), prune their partitions at the
    source, then rank the surviving codes by plan-literal distance
    tables.  The executed plan must show BOTH PartitionFilters on
    ivf_cluster AND a ReadSchema without any embedding column —
    pinned by test."""
    centroids, books = read_ivfpq_meta(path)
    probe = _nprobe_lists(centroids, quantize_query_or_raise(query_vec), nprobe)
    df = spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe))
    return _adc_rank(df, _adc_tables(books, query_vec), topk, id_col, exclude_ids)
