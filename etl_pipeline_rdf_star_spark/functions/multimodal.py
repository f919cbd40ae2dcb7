"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Container constraint (driver brief): no image/audio libraries ship here, so
the *decode kernels* are stubs — either ``NotImplementedError`` (strict
mode) or a deterministic fake (test mode) — while everything Spark-side is
real and tested: the schema contract, the batch iterator signature, the
partition sizing, and the pipeline composition. Swapping in PIL/ffmpeg on a
real cluster changes only the kernel body.

Why mapInPandas (not a scalar pandas_udf): media decode is
many-rows-in/many-rows-out with per-batch setup cost (codec init), and
frame sampling is a fan-OUT (one video row → n frame rows) — exactly the
iterator-of-DataFrames contract.
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
        StructField("mime", StringType()),
        StructField("data", BinaryType()),  # opaque payload
        StructField("width", IntegerType()),  # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = md5-derived bytes) so the
    plumbing is testable without real codecs."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.unbase64(F.base64(F.encode(F.md5(F.col("id").cast("string")), "utf-8"))).alias(
            "data"
        ),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") * 40 + 1000).alias("duration_ms"),
    )


def _decode_stub(data: bytes, strict: bool) -> list[float]:
    if strict:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg — not available in this container"
        )
    # deterministic fake: 8 floats from payload bytes
    return [float(b) / 255.0 for b in (data or b"\x00" * 8)[:8]]


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """binary → fixed-width float feature vector, Arrow-batched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        _decode_stub(d, strict) for d in pdf["data"]
                    ],
                    "n_bytes": [len(d or b"") for d in pdf["data"]],
                }
            )

    return df.select("media_id", "data").mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """video rows → frame rows (fan-out: one input row yields
    duration_ms/every_ms outputs). Frame payloads are stub slices."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if strict:
                    raise NotImplementedError("frame extraction needs ffmpeg")
                n = max(1, int(row["duration_ms"] // every_ms))
                for i in range(min(n, 16)):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append((row["data"] or b"")[:4] + bytes([i]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "duration_ms", "data")
        .mapInPandas(kernel, FRAME_SCHEMA)
    )


def resize_images(df: DataFrame, w: int = 224, h: int = 224, strict: bool = False) -> DataFrame:
    """image rows → resized payloads (stub: metadata-updated passthrough)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("image resize needs PIL")
            out = pdf.copy()
            out["width"] = w
            out["height"] = h
            yield out

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("data", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "data", "width", "height")
        .mapInPandas(kernel, schema)
    )
