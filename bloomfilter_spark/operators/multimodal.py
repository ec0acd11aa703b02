"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no codec libraries (no pillow/librosa/av), so real
JPEG/WAV decoding is gated behind optional imports — but the PIPELINE is
not stubbed: a deterministic fake codec (`BFIM` raw-image / `BFAU` pcm
frames, documented headers below) exercises the full decode → resize →
feature-extract path end-to-end with real numpy math and real Spark-side
plumbing (schema, Arrow binary transport, mapInPandas batch shapes).  A
real codec drops in behind `decode_image`/`decode_audio` without touching
anything downstream.  Blobs that are neither a known fake container nor
decodable by an installed backend raise NotImplementedError (clearly
marked — never silently fabricated).

Fake container formats (little-endian):
  BFIM: b"BFIM" | u8 channels | u16 width | u16 height | h*w*c uint8 pixels
  BFAU: b"BFAU" | u32 sample_rate | u32 n_samples | n int16 samples
"""

from __future__ import annotations

import struct
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

FAKE_IMAGE_MAGIC = b"BFIM"
FAKE_AUDIO_MAGIC = b"BFAU"

try:  # optional real decode backends — absent in this container
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def encode_image_array(arr: np.ndarray) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a BFIM blob."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return (
        FAKE_IMAGE_MAGIC
        + struct.pack("<BHH", c, w, h)
        + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    )


def encode_audio_array(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 pcm samples as a BFAU blob."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    return (
        FAKE_AUDIO_MAGIC + struct.pack("<II", sample_rate, len(s)) + s.tobytes()
    )


def decode_image(blob: bytes) -> np.ndarray:
    """Decode an image blob to an (h, w, c) uint8 array.

    BFIM blobs decode natively (header parse + zero-copy frombuffer); real
    formats decode iff pillow is installed; anything else raises."""
    if blob[:4] == FAKE_IMAGE_MAGIC:
        c, w, h = struct.unpack_from("<BHH", blob, 4)
        px = np.frombuffer(blob, dtype=np.uint8, count=h * w * c, offset=9)
        return px.reshape(h, w, c)
    if _HAS_PIL:
        import io

        arr = np.asarray(_PIL_Image.open(io.BytesIO(blob)))
        return arr[:, :, None] if arr.ndim == 2 else arr
    raise NotImplementedError(
        "blob is not a BFIM container and real image decode requires "
        "pillow, which is not installed in this container"
    )


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio blob to (int16 samples, sample_rate)."""
    if blob[:4] == FAKE_AUDIO_MAGIC:
        sr, n = struct.unpack_from("<II", blob, 4)
        return np.frombuffer(blob, dtype="<i2", count=n, offset=12), sr
    raise NotImplementedError(
        "blob is not a BFAU container and no real audio backend "
        "(librosa/soundfile) is installed in this container"
    )


def resize_area(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-average resize (h, w, c) → (out_h, out_w, c).

    Pixel (i, j) averages the source box [i*h/out_h, (i+1)*h/out_h) ×
    [j*w/out_w, (j+1)*w/out_w) — pure numpy, no codec dependency."""
    h, w, c = arr.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    # integral image: box sums in O(1) per output pixel
    ii = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    np.cumsum(np.cumsum(arr, axis=0), axis=1, out=ii[1:, 1:])
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        rows = ii[y1] - ii[y0]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = (rows[x1] - rows[x0]) / ((y1 - y0) * (x1 - x0))
    return out


def decode_media_features(
    df: DataFrame, blob_col: str = "blob", thumb: int = 4
) -> DataFrame:
    """Full decode → resize/analyze → feature pipeline per media row.

    Adds: width, height, channels, decode_ok, and `moments` array<double>
    (images: [mean, std] + thumb×thumb gray thumbnail; audio: [rms, zcr]).
    Audio rows report (n_samples, 1, 1) as their dimensions.  Rows that
    can't decode get decode_ok=false and null dimensions rather than
    failing the job (corrupt inputs are data, not errors, at 100 TB)."""

    def feat_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            width, height, channels, ok, moments = [], [], [], [], []
            for b in pdf[blob_col]:
                b = bytes(b) if b is not None else b""
                try:
                    if b[:4] == FAKE_AUDIO_MAGIC:
                        samples, _sr = decode_audio(b)
                        x = samples.astype(np.float64)
                        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                        zcr = (
                            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                            if len(x) > 1
                            else 0.0
                        )
                        width.append(len(samples)), height.append(1)
                        channels.append(1), ok.append(True)
                        moments.append([round(rms, 6), round(zcr, 6)])
                    else:
                        arr = decode_image(b)
                        h, w, c = arr.shape
                        small = resize_area(arr, thumb, thumb).mean(axis=2)
                        width.append(w), height.append(h)
                        channels.append(c), ok.append(True)
                        moments.append(
                            [round(float(arr.mean()), 6),
                             round(float(arr.std()), 6)]
                            + [round(float(v), 6) for v in small.ravel()]
                        )
                except (
                    NotImplementedError,
                    ValueError,
                    IndexError,
                    struct.error,
                    OSError,  # PIL.UnidentifiedImageError and friends —
                    # with pillow installed a corrupt/non-image blob must
                    # yield decode_ok=false, not kill the job
                ):
                    width.append(None), height.append(None)
                    channels.append(None), ok.append(False), moments.append(None)
            pdf = pdf.copy()
            pdf["width"], pdf["height"] = width, height
            pdf["channels"], pdf["decode_ok"] = channels, ok
            pdf["moments"] = moments
            yield pdf

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("channels", T.LongType()),
            T.StructField("decode_ok", T.BooleanType()),
            T.StructField("moments", T.ArrayType(T.DoubleType())),
        ]
    )
    return df.mapInPandas(feat_iter, schema=schema)


def synthetic_media(spark, n: int, num_partitions: int | None = None) -> DataFrame:
    """Deterministic media table: even ids are BFIM images, odd ids BFAU
    audio; dimensions and content are pure functions of media_id, so an
    external oracle can recompute the decoded dimensions from the id
    alone.  Formulas (id = media_id):
      image: channels = 1 + id%3, width = 16 + (id%5)*8, height = 12 + (id%7)*4,
             pixel[y,x,c] = (3x + 5y + 11c + 7id) % 256
      audio: sample_rate = 8000, n_samples = 400 + (id%50)*16,
             sample[t] = ((t*(id%13+1)) % 2048) - 1024
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    c = 1 + i % 3
                    w = 16 + (i % 5) * 8
                    h = 12 + (i % 7) * 4
                    y, x, ch = np.ogrid[:h, :w, :c]
                    px = ((3 * x + 5 * y + 11 * ch + 7 * i) % 256).astype(
                        np.uint8
                    )
                    rows.append((i, "image", encode_image_array(px)))
                else:
                    ns = 400 + (i % 50) * 16
                    t = np.arange(ns, dtype=np.int64)
                    s = ((t * (i % 13 + 1)) % 2048 - 1024).astype(np.int16)
                    rows.append((i, "audio", encode_audio_array(s, 8000)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "blob"])

    if num_partitions is None:
        # n is small by construction (a synthetic test/bench table, not the
        # scale path — real media arrives via media_from_pages).  Don't fan
        # a few hundred rows across every core: each extra partition is a
        # python-worker checkout whose fixed cost dwarfs the ~60-row batch,
        # and measured end-of-catalog worker churn made a 300-row decode
        # pay 32 respawns (~15-20 s) for ~0.5 s of work.
        num_partitions = max(
            1, min(spark.sparkContext.defaultParallelism, n // 64 + 1)
        )
    return spark.range(n, numPartitions=num_partitions).mapInPandas(
        gen, schema="media_id long, kind string, blob binary"
    )


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
