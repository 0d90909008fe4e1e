"""Multimodal (image/audio/video) column plumbing (X6).

Media are opaque ``binary`` columns with a typed metadata struct — the
Spark-side contract (schema, partitioning, Arrow batch shape) is real
and tested; the actual decode is stubbed because codec libraries are
not available in this environment (clearly marked below). On a real
cluster only ``_decode_stub`` changes.

Scale design: media rows are huge, so the pipeline uses
``mapInPandas`` (Arrow batches, bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch) and keeps metadata-only
operations (filter by width/duration, partition routing) on pruned
columns so Parquet never materializes the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", LongType()),
        StructField("meta_format", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB — real image/audio decode is unavailable in this container.

    Deterministic fake: 8 floats derived from payload bytes, so tests
    can assert the full pipeline (schema, batching, ordering) without
    codec libraries. Replace with PIL/torchaudio/ffmpeg on a real
    cluster; everything around it is production plumbing.
    """
    if payload is None:
        raise NotImplementedError("media decode requires codec libs; payload missing")
    h = 1469598103934665603
    for b in payload[:64]:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return [float((h >> (8 * i)) & 0xFF) / 255.0 for i in range(8)]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract media rows via Arrow-batched mapInPandas.

    The batch function is pure and per-partition; no state crosses
    batches, so the same code runs under Structured Streaming.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _decode_stub(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def binary_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Typed metadata extraction over an opaque binary column via
    Arrow-batched ``mapInPandas`` — the exact plumbing a real decode
    step rides on (schema declared up front, per-batch pure function,
    payload column pruned away in the output)."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("first_byte", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "first_byte": [
                        int(p[0]) if p is not None and len(p) > 0 else None
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fixture generator for tests (payload = id bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        (F.col("id") % 1920).cast("int").alias("meta_width"),
        (F.col("id") % 1080).cast("int").alias("meta_height"),
        (F.col("id") * 1000).cast("long").alias("meta_duration_ms"),
        F.lit("synthetic").alias("meta_format"),
    )
