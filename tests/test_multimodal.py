"""Multimodal plumbing: schemas, batch shapes, determinism, dedup. Codecs
are stubbed (not in this container) but all Spark-side structure is real."""

from pyspark.sql import functions as F

from kgforge.multimodal import (
    EMBED_DIM,
    MFCC_DIM,
    audio_features,
    image_features,
    near_dup_images,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_image_features_schema_and_determinism(spark):
    media = synthetic_media(spark, 60, partitions=2)
    f1 = image_features(media)
    rows = f1.orderBy("media_id").collect()
    assert rows and all(len(r.embedding) == EMBED_DIM for r in rows)
    # unit-norm embeddings
    assert all(abs(sum(x * x for x in r.embedding) - 1.0) < 1e-3 for r in rows)
    # deterministic across runs
    rows2 = image_features(media).orderBy("media_id").collect()
    assert [r.phash for r in rows] == [r.phash for r in rows2]


def test_resize_bounds(spark):
    media = synthetic_media(spark, 60, partitions=2)
    out = resize_images(media, max_side=256)
    assert out.filter(F.greatest("width", "height") > 256).count() == 0
    assert out.count() > 0


def test_frame_sampling(spark):
    media = synthetic_media(spark, 60, partitions=2)
    frames = sample_frames(media, every_ms=1000)
    per = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n"), F.max("ts_ms").alias("mx"))
    rows = per.collect()
    assert rows and all(r.n >= 1 and r.mx < 30_000 for r in rows)
    # frame indexes are dense from 0
    mx = frames.groupBy("media_id").agg(F.max("frame_idx").alias("m"), F.count(F.lit(1)).alias("n"))
    assert mx.filter(F.col("m") != F.col("n") - 1).count() == 0


def test_audio_features(spark):
    media = synthetic_media(spark, 60, partitions=2)
    rows = audio_features(media).collect()
    assert rows and all(len(r.mfcc) == MFCC_DIM and r.duration_ms > 0 for r in rows)


def test_near_dup_images(spark):
    # synthetic_media plants identical payloads for media_id // 7 groups
    media = synthetic_media(spark, 84, partitions=2)
    dups = near_dup_images(media)
    assert dups.filter(F.col("n_dups") > 1).count() > 0
    total = dups.agg(F.sum("n_dups")).collect()[0][0]
    assert total == media.filter(F.col("kind") == "image").count()
