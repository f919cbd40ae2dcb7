"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Decode support (round 2): REAL kernels for uncompressed formats via
pure-numpy/stdlib codecs (:mod:`.codecs`) —

* ``image/x-portable-pixmap`` — P6 PPM decode, nearest-neighbor resize
* ``audio/wav``                — RIFF PCM16 decode (stdlib ``wave``)
* ``video/x-ppm-stream``       — concatenated-PPM frame splitting

Compressed formats (JPEG/H.264/MP3) would need PIL/ffmpeg, which this
container doesn't ship: for those mimes strict mode raises
``NotImplementedError`` and lax mode produces a clearly-fake byte-derived
feature. The Spark-side contract — schemas, Arrow batch iterators,
fan-out shapes, partition sizing — is identical either way; a real cluster
only widens the mime dispatch table.

Why mapInPandas (not a scalar pandas_udf): media decode is
many-rows-in/many-rows-out with per-batch setup cost (codec init), and
frame sampling is a fan-OUT (one video row → n frame rows) — exactly the
iterator-of-DataFrames contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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

from . import codecs

MIME_PPM = "image/x-portable-pixmap"
MIME_WAV = "audio/wav"
MIME_PPM_VIDEO = "video/x-ppm-stream"

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

_KIND = {0: ("image", MIME_PPM), 1: ("audio", MIME_WAV), 2: ("video", MIME_PPM_VIDEO)}


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL payloads: PPM gradients, WAV
    sine bursts, concatenated-PPM video — generated partition-locally in
    the same mapInPandas shape the decode stages use (scales by ``n``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind, mime = _KIND[mid % 3]
                if kind == "image":
                    w, h = 16 + mid % 8, 12 + mid % 5
                    data, dur = codecs.synth_ppm(mid, w, h), 0
                elif kind == "audio":
                    ms = 40 + (mid % 4) * 20
                    data, (w, h), dur = codecs.synth_wav(mid, ms=ms), (0, 0), ms
                else:
                    nf = 3 + mid % 3
                    w, h = 8, 6
                    data = codecs.synth_ppm_video(mid, n_frames=nf, w=w, h=h)
                    dur = nf * 1000  # 1 fps
                rows.append((mid, kind, mime, data, w, h, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "data", "width", "height",
                    "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(kernel, MEDIA_SCHEMA)


def _feature(mime: str, data: bytes, strict: bool) -> list[float]:
    """8-float feature vector per media row (fixed width across kinds)."""
    data = data or b""
    if mime == MIME_PPM:
        img = codecs.decode_ppm(data)
        gray = img.astype(np.float32).mean(axis=-1)
        return [
            float(img.shape[1]),
            float(img.shape[0]),
            float(img[..., 0].mean()),
            float(img[..., 1].mean()),
            float(img[..., 2].mean()),
            float(gray.std()),
            float(gray.min()),
            float(gray.max()),
        ]
    if mime == MIME_WAV:
        samples, sr = codecs.decode_wav(data)
        mono = samples.mean(axis=1)
        zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        return [
            float(sr),
            float(len(mono)),
            float(np.sqrt(np.mean(mono**2))),
            zc,
            float(mono.max()),
            float(mono.min()),
            float(np.abs(mono).mean()),
            0.0,
        ]
    if mime == MIME_PPM_VIDEO:
        frames = codecs.split_ppm_stream(data)
        first = codecs.decode_ppm(frames[0])
        return [
            float(len(frames)),
            float(first.shape[1]),
            float(first.shape[0]),
            float(first.mean()),
            float(codecs.decode_ppm(frames[-1]).mean()),
            0.0,
            0.0,
            0.0,
        ]
    if strict:
        raise NotImplementedError(
            f"decode for {mime!r} requires PIL/ffmpeg — not in this container"
        )
    return [float(b) / 255.0 for b in (data or b"\x00" * 8)[:8]]


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """binary → fixed-width float feature vector, Arrow-batched; real
    decode for PPM/WAV/PPM-stream, mime-gated fallback otherwise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        _feature(m, d, strict)
                        for m, d in zip(pdf["mime"], pdf["data"])
                    ],
                    "n_bytes": [len(d or b"") for d in pdf["data"]],
                }
            )

    return df.select("media_id", "mime", "data").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """video rows → frame rows (fan-out). PPM streams split for real; each
    output frame is a standalone decodable PPM."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                data = row["data"] or b""
                if row["mime"] == MIME_PPM_VIDEO:
                    all_frames = codecs.split_ppm_stream(data)
                    frame_ms = max(1, int(row["duration_ms"]) // max(1, len(all_frames)))
                    step = max(1, every_ms // frame_ms)
                    for i in range(0, len(all_frames), step):
                        ids.append(row["media_id"])
                        idxs.append(i)
                        frames.append(all_frames[i])
                elif strict:
                    raise NotImplementedError(
                        f"frame extraction for {row['mime']!r} needs ffmpeg"
                    )
                else:
                    n = max(1, int(row["duration_ms"] // every_ms))
                    for i in range(min(n, 16)):
                        ids.append(row["media_id"])
                        idxs.append(i)
                        frames.append(data[:4] + bytes([i]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "mime", "duration_ms", "data")
        .mapInPandas(kernel, FRAME_SCHEMA)
    )


def resize_images(
    df: DataFrame, w: int = 224, h: int = 224, strict: bool = False
) -> DataFrame:
    """image rows → resized payloads. PPM: real decode → nearest-neighbor
    resize → re-encode; other mimes strict-raise or pass through."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                data = row["data"]
                if row["mime"] == MIME_PPM:
                    img = codecs.decode_ppm(data)
                    data = codecs.encode_ppm(codecs.resize_nearest(img, w, h))
                elif strict:
                    raise NotImplementedError(
                        f"image resize for {row['mime']!r} needs PIL"
                    )
                out_rows.append((row["media_id"], data, w, h))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "data", "width", "height"]
            )

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
        .select("media_id", "mime", "data", "width", "height")
        .mapInPandas(kernel, schema)
    )
