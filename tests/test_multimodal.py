"""Multimodal column plumbing (north star): binary payloads + typed
metadata through mapInPandas feature extraction, with the decode step
stubbed deterministically (no media libs in this container)."""

from __future__ import annotations

import hashlib

import pytest

from aprs2influxdb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_stub,
    extract_features,
    media_meta,
    resize_image_stub,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG" + bytes(range(100)), 64, 64, None),
        (2, "audio", "audio/wav", b"RIFF" + bytes(200), None, None, 2000),
        (3, "image", "image/jpeg", None, None, None, None),  # missing blob
        (4, "video", "video/mp4", b"\x00\x00ftyp", 1920, 1080, 60000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_batch_shape(spark, media):
    out = extract_features(media).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [1, 2, 3, 4]
    png = out[0]
    assert png["n_bytes"] == 104
    assert png["digest"] == hashlib.sha256(b"\x89PNG" + bytes(range(100))).hexdigest()
    assert png["feat_mean"] == sum((b"\x89PNG" + bytes(range(100)))[:64])
    # null payload flows through without poisoning the batch
    assert out[2]["n_bytes"] == 0 and out[2]["digest"] is None


def test_media_meta_prunes_blob(spark, media):
    meta = media_meta(media)
    assert "payload" not in meta.columns
    row = meta.filter("media_id = 4").collect()[0]
    assert row["n_bytes"] == 6 and row["width"] == 1920


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image_stub(None)
    assert decode_image_stub(b"abc")["n_bytes"] == 3


def test_resize_is_image_only_and_deterministic(spark, media):
    out = resize_images(media, 8, 8).orderBy("media_id").collect()
    # only the two image rows survive the kind filter
    assert [r["media_id"] for r in out] == [1, 3]
    assert out[0]["width"] == 8 and out[0]["height"] == 8
    assert out[0]["payload"] == resize_image_stub(b"\x89PNG" + bytes(range(100)), 8, 8)
    assert out[1]["payload"] is None  # missing blob passes through as null


def test_frame_sampling_null_duration(spark):
    # nullable longs surface as NaN in pandas (truthy!) — a video with
    # no duration metadata must yield zero frames, not kill the task
    rows = [(9, "video", "video/mp4", b"vv", None, None, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert sample_frames(media, every_ms=1000).count() == 0


def test_frame_sampling_fans_out(spark, media):
    out = sample_frames(media, every_ms=10_000).orderBy("frame_idx").collect()
    # one video of 60 s sampled at 10 s -> 6 frames
    assert [r["media_id"] for r in out] == [4] * 6
    assert [r["ts_ms"] for r in out] == [0, 10_000, 20_000, 30_000, 40_000, 50_000]
    digests = {r["frame_digest"] for r in out}
    assert len(digests) == 6  # per-frame digests distinct

    assert sample_frames(media, every_ms=10_000).columns == [
        "media_id", "frame_idx", "ts_ms", "frame_digest",
    ]
