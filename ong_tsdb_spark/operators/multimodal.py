"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Design for 100 TB: the binary column never leaves the executor —
decode/feature-extract runs per Arrow batch next to the Parquet scan;
only small typed features shuffle.  The decode step itself is STUBBED
(image/audio libraries are not in this container): ``decode_stub``
computes deterministic fake features from the raw bytes so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested end-to-end; swap ``_decode_one`` for a real decoder (PIL,
soundfile, av) in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the extracted feature rows
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.FloatType()),
    ]
)


def _decode_one(payload: bytes, media_type: str) -> tuple[int, int, float]:
    """STUB decoder: deterministic fake (width, height, duration)
    derived from the payload digest.  Replace with a real decoder;
    raise NotImplementedError for formats you refuse to fake."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media_type {media_type!r}")
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192  # 64..255, deterministic per content
    height = 64 + d[1] % 192
    duration = 0.0 if media_type == "image" else float(1 + d[2] % 60)
    return width, height, duration


def extract_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.  The
    generator-of-DataFrames shape keeps peak memory to one Arrow batch
    regardless of partition size."""

    # NOTE: the batch function must be fully self-contained — any
    # reference to a module-level name would be pickled *by reference*
    # and executor Python workers would need ong_tsdb_spark importable
    # (they inherit PYTHONPATH, not the driver's sys.path mutations).
    col_names = [f.name for f in FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def decode(payload: bytes, media_type: str) -> tuple[int, int, float]:
            # inline twin of _decode_one (keep in sync) — a closure
            # cell pointing at the module function would pickle by
            # reference and require the package on executor workers
            if media_type not in ("image", "audio", "video"):
                raise NotImplementedError(f"unknown media_type {media_type!r}")
            d = _hashlib.sha256(payload).digest()
            return 64 + d[0] % 192, 64 + d[1] % 192, (
                0.0 if media_type == "image" else float(1 + d[2] % 60)
            )

        for pdf in batches:
            payloads = pdf[payload_col]
            types = pdf[type_col]
            rows = []
            for i in range(len(pdf)):
                raw = bytes(payloads.iloc[i] or b"")
                mt = types.iloc[i]
                w, h, dur = decode(raw, mt)
                rows.append(
                    (
                        int(pdf[id_col].iloc[i]),
                        mt,
                        len(raw),
                        _hashlib.sha256(raw).hexdigest(),
                        w,
                        h,
                        dur,
                    )
                )
            yield _pd.DataFrame(rows, columns=col_names)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def fake_media_table(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Build a synthetic media table from the documents corpus: the
    text bytes stand in for an encoded payload (deterministic), with
    the typed-metadata columns a real pipeline would carry."""
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.col("source").alias("origin"),
    )
