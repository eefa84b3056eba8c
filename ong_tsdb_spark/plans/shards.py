"""Training-shard writer: materialize a corpus as packed parquet
shards in training order.

The last step of the data pipeline: after cleaning/dedup/mixing, the
corpus is written as fixed-size shards whose internal order IS the
training order — a loader streams shard files sequentially and gets
documents in the exact concat-and-split layout that
``operators/text.sequence_pack_stats`` computed.

Plan shape (all declarative, no driver loop over shards):

* the packing layout assigns every document a training-sequence bin
  (chunked prefix sum — parallelism is doc chunks, not one task);
* ``shard_id = bin_id div bins_per_shard`` makes each shard carry
  ``~bins_per_shard * seq_len`` tokens regardless of document length
  skew — shards are TOKEN-balanced, not document-balanced, which is
  what keeps training-step time uniform;
* one ``repartition(shard_id)`` co-locates each shard's documents,
  and ``partitionBy(shard_id)`` + in-partition sort by doc order
  writes each shard as its own directory in ONE job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard_id"


def pack_shard_assignments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 4096,
    bins_per_shard: int = 16,
) -> DataFrame:
    """The corpus with its packing layout and shard assignment
    attached: (…input columns…, n_tok, bin_id, bin_offset,
    n_bins_spanned, shard_id).  A document belongs to the shard its
    FIRST token lands in; a document spanning a shard boundary is
    duplicated into neither (the loader reads the next shard's first
    bin for the tail — the standard contiguous-layout convention)."""
    from ..operators.text import sequence_pack_stats

    if int(seq_len) < 1 or int(bins_per_shard) < 1:
        # seq_len=0 corrupts the packing arithmetic downstream and
        # bins_per_shard=0 makes `bin_id div 0` a silent NULL shard
        # (written as the Hive default partition, invisible to the
        # sequential loader) — fail loudly instead
        raise ValueError(
            f"seq_len and bins_per_shard must be >= 1, got "
            f"{seq_len}/{bins_per_shard}"
        )
    layout = sequence_pack_stats(
        df, text_col=text_col, id_col=id_col, seq_len=seq_len
    )
    return (
        df.join(layout, on=id_col)
        .withColumn(
            SHARD_COL,
            F.expr(f"bin_id div {int(bins_per_shard)}").cast("bigint"),
        )
    )


def write_packed_shards(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 4096,
    bins_per_shard: int = 16,
) -> int:
    """Write the corpus as token-balanced parquet shards
    (``out_dir/shard_id=N/``), each internally sorted in training
    order.  Returns the number of shards written.

    ``sortWithinPartitions`` after the shard repartition gives every
    parquet file ascending (bin_id, bin_offset) row order — the
    loader's sequential scan IS the training order, no shuffle at
    read time."""
    packed = pack_shard_assignments(
        df, text_col, id_col, seq_len=seq_len, bins_per_shard=bins_per_shard
    )
    (
        packed.repartition(F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, "bin_id", "bin_offset", id_col)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(out_dir)
    )
    spark = df.sparkSession
    return (
        spark.read.parquet(out_dir).select(SHARD_COL).distinct().count()
    )
