"""Multimodal plumbing: schemas, batching, deterministic stub kernels."""

from spel_spark.operators.multimodal import (
    audio_frame_sample,
    image_features,
    synthetic_media,
)


def test_image_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=30)
    f1 = image_features(media)
    rows1 = sorted((r.media_id, r.phash) for r in f1.collect())
    rows2 = sorted((r.media_id, r.phash) for r in image_features(media).collect())
    assert rows1 == rows2
    assert len(rows1) == media.filter("kind = 'image'").count()
    first = f1.first()
    assert len(first.feature) == 16
    assert len(first.phash) == 16


def test_audio_frame_sample(spark):
    media = synthetic_media(spark, n=30)
    out = audio_frame_sample(media)
    rows = out.collect()
    assert len(rows) == media.filter("kind = 'audio'").count()
    for r in rows:
        assert r.n_frames == max(1, r.duration_ms // 1000)
        assert len(r.feature) == 8


def test_corrupt_payload_dropped_not_fatal(spark):
    media = spark.createDataFrame(
        [(1, "image", b"", 10, 10, 0, "fake"), (2, "image", b"ok-bytes", 10, 10, 0, "fake")],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int, codec string",
    )
    out = image_features(media).collect()
    assert [r.media_id for r in out] == [2]
