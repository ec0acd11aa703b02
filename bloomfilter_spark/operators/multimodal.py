"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no codec libraries (no pillow/librosa/av), so the decode
step is STUBBED — `decode_image`/`decode_audio` raise NotImplementedError
unless the optional library import succeeds.  Everything around the stub is
real and tested: the media schema, binary-column Arrow transport, batch
shapes, deterministic byte-level feature extraction, and frame sampling as
offset-sliced windows (a deterministic stand-in for keyframe decoding with
the same Spark-side signature: binary → array<binary>).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video | html
        T.StructField("blob", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

try:  # optional decode backends — absent in this container
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(blob: bytes):
    """Decode an image blob to an array.  STUB: needs pillow."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires pillow, which is not installed in this "
            "container; Spark-side plumbing (schema/batching/features) is "
            "real and tested against deterministic byte-level features"
        )
    import io

    return np.asarray(_PIL_Image.open(io.BytesIO(blob)))


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Adapt the pages table into the media schema (kind='html')."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("html").alias("kind"),
        F.col("html").alias("blob"),
        F.create_map(
            F.lit("url"), F.col("url"),
            F.lit("bytes"), F.length("html").cast("string"),
        ).alias("meta"),
    )


def byte_histogram_features(
    df: DataFrame, blob_col: str = "blob", bins: int = 16
) -> DataFrame:
    """Adds `features` array<double>[bins]: normalized byte histogram.

    The deterministic feature extractor the decode stub hands off to —
    one numpy bincount per Arrow batch over the concatenated buffer."""
    from bloomfilter_spark.functions.hashing import bytes_view_of_binary

    def feat_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, offsets = bytes_view_of_binary(pdf[blob_col])
            # byte b → bin b*bins/256: correct for any bins ≤ 256, not
            # just divisors of 256
            shrink = (flat.astype(np.int64) * bins) >> 8
            doc_of = np.repeat(
                np.arange(len(pdf), dtype=np.int64), offsets[1:] - offsets[:-1]
            )
            hist = np.zeros((len(pdf), bins), dtype=np.float64)
            np.add.at(hist, (doc_of, shrink), 1.0)
            totals = hist.sum(axis=1, keepdims=True)
            totals[totals == 0] = 1.0
            hist /= totals
            pdf = pdf.copy()
            pdf["features"] = list(np.round(hist, 6))
            yield pdf

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )
    return df.mapInPandas(feat_iter, schema=schema)


def sample_frames(
    df: DataFrame, blob_col: str = "blob", n_frames: int = 4, frame_bytes: int = 64
) -> DataFrame:
    """Adds `frames` array<binary>: n evenly spaced fixed-size windows.

    Deterministic stand-in for video keyframe sampling with the real
    signature (binary → array<binary>); a codec-backed implementation
    drops in behind the same column contract."""

    def frame_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = []
            for b in pdf[blob_col]:
                b = b or b""
                if len(b) == 0:
                    frames.append([])
                    continue
                step = max(1, (len(b) - frame_bytes) // max(1, n_frames - 1))
                frames.append(
                    [
                        b[off : off + frame_bytes]
                        for off in range(0, len(b), step)[:n_frames]
                    ]
                )
            pdf = pdf.copy()
            pdf["frames"] = frames
            yield pdf

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("frames", T.ArrayType(T.BinaryType()))]
    )
    return df.mapInPandas(frame_iter, schema=schema)
