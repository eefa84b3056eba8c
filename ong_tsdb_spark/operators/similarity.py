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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


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
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    scored = df.select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine"))
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "cosine", "rank")
    )


def cosine_pairs_blocked(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs within blocks: (d1 < d2,
    cosine >= threshold).  The block key bounds the quadratic term."""
    slim = df.select(F.col(id_col), F.col(block_col).alias("__blk"), F.col(vec_col))
    a, b = slim.alias("a"), slim.alias("b")
    cos = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, on="__blk")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


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
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(v).cast("double") for v in _hyperplane(p, dim)])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return df.select(F.col(id_col), bucket.alias("bucket"))
