"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step itself (image/audio codecs) is STUBBED — the container
has no media libraries — behind ``decoder=`` hooks with a deterministic
fake used by default in tests.  Everything Spark-side is real and
tested: the schema convention, Arrow-batched mapInPandas plumbing,
batch shapes, size-based repartitioning, and the feature tables the
fake decoder produces are exactly what a real decoder would feed.

Schema convention:
    media(id long, media_type string, content binary, meta map<string,string>)

Operators:
- media_stats:        per-item byte size/hash features (pure Catalyst)
- extract_features:   mapInPandas -> fixed-dim float vector per item
                      (decoder hook; deterministic fake = hashed bytes)
- sample_frames:      video frame sampling plumbing: emits (id, frame_idx,
                      frame binary) rows; fake decoder slices the blob
- resize_images:      image resize plumbing (binary -> binary + new meta)
- partition_by_size:  skew guard: large blobs spread so no task holds
                      more than ~target_bytes of media
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def fake_decode_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: expands the
    sha256 of the bytes into `dim` floats in [-1, 1)."""
    if blob is None:
        return np.zeros(dim, dtype=np.float32)
    seed = int.from_bytes(hashlib.sha256(blob).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return (rng.random(dim, dtype=np.float32) * 2 - 1).astype(np.float32)


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-level features: size, hash, magic prefix (pure Catalyst)."""
    return df.select(
        "id",
        "media_type",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2(F.col("content").cast("binary"), 256).alias("content_sha256"),
        F.hex(F.substring("content", 1, 4)).alias("magic"),
        F.element_at("meta", "source").alias("source"),
    )


def extract_features(df: DataFrame, dim: int = 64, decoder=None) -> DataFrame:
    """(id, media_type, features array<float>) via Arrow-batched pandas.

    `decoder(blob: bytes, dim: int) -> np.ndarray[float32, dim]` — plug a
    real image/audio encoder here; defaults to the deterministic fake.
    Real decoders raising NotImplementedError surface per-item as nulls.
    """
    dec = decoder or fake_decode_features
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def fn(batches):
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                try:
                    feats.append(dec(bytes(blob) if blob is not None else None, dim))
                except NotImplementedError:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return df.select("id", "media_type", "content").mapInPandas(fn, schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8,
                  decoder=None) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The fake decoder treats the blob as a concatenation of fixed-size
    'frames'; a real decoder would demux + seek.  Output shape (what a
    downstream image model consumes) is the contract being tested."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf["id"], pdf["content"]):
                if blob is None:
                    continue
                b = bytes(blob)
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for k in range(n):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(b[k * every_n_bytes:(k + 1) * every_n_bytes])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return (
        df.filter(F.col("media_type") == "video")
        .select("id", "content")
        .mapInPandas(fn, schema)
    )


def resize_images(df: DataFrame, target: tuple[int, int] = (224, 224), decoder=None) -> DataFrame:
    """Image-resize plumbing: binary in -> binary out + updated meta.
    Real codec stubbed: the fake 'resize' is a deterministic re-hash of
    the payload sized target_w*target_h bytes (shape contract only)."""
    w, h = target
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        ]
    )

    def fn(batches):
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                if blob is None:
                    out.append(None)
                    continue
                if decoder is not None:
                    out.append(decoder(bytes(blob), (w, h)))
                else:
                    # deterministic fake: stretch sha256 into w*h/64 bytes
                    need = max(1, w * h // 64)
                    seed = hashlib.sha256(bytes(blob)).digest()
                    out.append((seed * (need // len(seed) + 1))[:need])
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": out,
                    "meta": [{"resized": f"{w}x{h}"}] * len(pdf),
                }
            )

    return df.filter(F.col("media_type") == "image").select("id", "content").mapInPandas(fn, schema)


def partition_by_size(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Skew guard for media tables: repartition so expected bytes per
    partition ~= target_bytes (blobs vary 1KB..1GB; row-count-based
    partitioning would put several huge videos on one task)."""
    total = df.select(F.sum(F.length("content"))).collect()[0][0] or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n, F.col("id"))
