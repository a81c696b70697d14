"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with structured
metadata; the expensive per-item work (decode, feature extraction, resize,
frame sampling) runs in Arrow-batched pandas UDFs over ``mapInPandas`` so
the Python cost is amortized per batch and the schema stays columnar.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this container,
so the decode step is STUBBED behind ``_decode_*`` functions that produce
DETERMINISTIC fake decodings derived from the bytes (sha256-seeded). The
Spark-side plumbing — schemas, batch shapes, partitioning, UDF signatures —
is real and tested; swapping a stub for a real codec changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),  # opaque payload
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("phash", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_phash", T.StringType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("mfcc", T.ArrayType(T.FloatType())),
    ]
)

EMBED_DIM = 16
MFCC_DIM = 13


def _seed_rng(content: bytes) -> np.random.Generator:
    digest = hashlib.sha256(content).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "big"))


def _decode_image_stub(content: bytes, width: int | None, height: int | None):
    """STUB decode (no PIL in this container): deterministic pseudo-pixels.
    Replace with `PIL.Image.open(io.BytesIO(content))` in production —
    raise to make any accidental real-decode dependency loud."""
    rng = _seed_rng(content)
    w = int(width or (64 + int(rng.integers(0, 192))))
    h = int(height or (64 + int(rng.integers(0, 192))))
    emb = rng.standard_normal(EMBED_DIM).astype(np.float32)
    emb /= float(np.linalg.norm(emb) or 1.0)
    phash = hashlib.sha256(b"phash:" + content).hexdigest()[:16]
    return w, h, emb, phash


def _decode_audio_stub(content: bytes, duration_ms: int | None):
    rng = _seed_rng(content)
    dur = int(duration_ms or int(rng.integers(500, 30_000)))
    mfcc = rng.standard_normal(MFCC_DIM).astype(np.float32)
    return dur, mfcc


def image_features(media: DataFrame) -> DataFrame:
    """images → (width, height, unit-norm embedding, perceptual hash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = r.meta or {}
                w, h, emb, ph = _decode_image_stub(bytes(r.content), meta.get("width"), meta.get("height"))
                rows.append((r.media_id, w, h, [float(x) for x in emb], ph))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "embedding", "phash"])

    return media.filter(F.col("kind") == "image").mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int) -> DataFrame:
    """Resize plumbing: recompute metadata for a bounded longest side (the
    stub scales metadata; a real impl would transcode `content`)."""
    feats = image_features(media)
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return feats.select(
        "media_id",
        F.floor(F.col("width") * scale).cast("int").alias("width"),
        F.floor(F.col("height") * scale).cast("int").alias("height"),
        "embedding",
        "phash",
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one row per sampled frame (explode-style fanout
    inside the batch UDF — the shape a real ffmpeg-backed sampler has)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = r.meta or {}
                dur, _ = _decode_audio_stub(bytes(r.content), meta.get("duration_ms"))
                for k, ts in enumerate(range(0, dur, every_ms)):
                    ph = hashlib.sha256(b"frame:" + bytes(r.content) + str(k).encode()).hexdigest()[:16]
                    rows.append((r.media_id, k, ts, ph))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame_phash"])

    return media.filter(F.col("kind") == "video").mapInPandas(batches, schema=FRAME_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = r.meta or {}
                dur, mfcc = _decode_audio_stub(bytes(r.content), meta.get("duration_ms"))
                rows.append((r.media_id, dur, [float(x) for x in mfcc]))
            yield pd.DataFrame(rows, columns=["media_id", "duration_ms", "mfcc"])

    return media.filter(F.col("kind") == "audio").mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


def near_dup_images(media: DataFrame) -> DataFrame:
    """Exact-phash image dedup: same pipeline shape as text exact-dedup
    (hash → groupBy → canonical representative)."""
    feats = image_features(media)
    return feats.groupBy("phash").agg(
        F.min("media_id").alias("canonical_media_id"), F.count(F.lit(1)).alias("n_dups")
    )


def synthetic_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table derived from row ids (test/bench input)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                content = hashlib.sha256(f"media:{i // 7}".encode()).digest() * 4  # planted dups
                meta = {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 320 + (i % 5) * 160 if kind == "image" else None,
                    "height": 240 + (i % 3) * 120 if kind == "image" else None,
                    "duration_ms": 2500 + (i % 4) * 1500 if kind in ("audio", "video") else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                }
                rows.append((i, kind, content, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=MEDIA_SCHEMA)
