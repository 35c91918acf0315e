"""Multimodal column plumbing: metadata extraction, resize, frame
sampling, feature extraction — all through real mapInPandas execution
with the deterministic fake codec."""

import pytest

from storagetapper_spark.operators.multimodal import (
    extract_metadata,
    frame_sample,
    image_resize,
    make_fake_payload,
    media_features,
    _decode,
)


def _media_df(spark):
    rows = [
        (1, make_fake_payload("image", 640, 480, 0, b"x" * 100)),
        (2, make_fake_payload("audio", 0, 0, 5000, b"y" * 50)),
        (3, make_fake_payload("video", 1280, 720, 3500, b"z" * 200)),
        (4, b"not a media file"),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_extract_metadata(spark):
    out = {r.media_id: r.meta for r in extract_metadata(_media_df(spark)).collect()}
    assert out[1].modality == "image" and (out[1].width, out[1].height) == (640, 480)
    assert out[2].modality == "audio" and out[2].duration_ms == 5000
    assert out[3].modality == "video"
    # undecodable payload tolerated, not fatal
    assert out[4].modality is None and out[4].byte_size == 16
    assert len(out[1].sha256) == 64


def test_image_resize(spark):
    resized = image_resize(_media_df(spark), 64, 48)
    metas = {r.media_id: r.meta for r in extract_metadata(resized).collect()}
    assert (metas[1].width, metas[1].height) == (64, 48)
    # non-images untouched
    assert metas[2].duration_ms == 5000
    assert metas[3].width == 1280


def test_frame_sample_fanout(spark):
    frames = frame_sample(_media_df(spark), every_ms=1000).collect()
    # only the video row fans out: 3500ms → 3 frames
    assert {f.media_id for f in frames} == {3}
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 1, 2]
    assert all(f.frame_ts_ms == f.frame_idx * 1000 for f in frames)
    meta = _decode(bytes(frames[0].frame))
    assert meta["modality"] == "image" and meta["width"] == 1280


def test_media_features_deterministic(spark):
    f1 = {r.media_id: list(r.feature) for r in media_features(_media_df(spark)).collect()}
    f2 = {r.media_id: list(r.feature) for r in media_features(_media_df(spark)).collect()}
    assert f1 == f2
    assert len(f1[1]) == 16
    assert all(-1.0 <= x <= 1.0 for x in f1[1])
    assert f1[1] != f1[2]


def test_unknown_codec_raises():
    with pytest.raises((NotImplementedError, ValueError)):
        _decode(b"??????")


def test_media_features_compose_with_ann(spark):
    """The multimodal embedding slot feeds similarity search unchanged:
    extract features from binary payloads, then run the same ANN
    operator the text/embedding pipeline uses (duplicate payloads must
    rank as each other's top match, cosine 1.0)."""
    from pyspark.sql import functions as F

    from storagetapper_spark.operators.multimodal import make_fake_payload
    from storagetapper_spark.operators.similarity import brute_force_topk

    rows = [(i, make_fake_payload("image", 64, 64, body=bytes([i % 3])))
            for i in range(9)]  # 3 distinct payloads, 3 copies each
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = media_features(media, dim=16)
    corpus = feats.filter(F.col("media_id") >= 3) \
                  .withColumnRenamed("feature", "embedding") \
                  .withColumnRenamed("media_id", "vec_id")
    queries = feats.filter(F.col("media_id") < 3) \
                   .select(F.col("media_id").alias("query_id"),
                           F.col("feature").alias("embedding"))
    top = brute_force_topk(corpus, queries, k=1)
    for r in top.collect():
        # top match is the same payload's other copy: seed equality
        assert r.vec_id % 3 == r.query_id % 3
        assert abs(r.cosine_sim - 1.0) < 1e-6
