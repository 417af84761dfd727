"""Multimodal plumbing tests: decode/feature/resize/frame-sample through
real mapInPandas stages (codecs stubbed per task spec, plumbing real)."""

import numpy as np
import pytest

from datasketches_rust_spark.multimodal import (audio_features,
                                                frame_sample, image_features,
                                                pack_fake_video,
                                                resize_images)
from datasketches_rust_spark.sources.codec import decode_png
from datasketches_rust_spark.sources.images import images_spark_df


@pytest.fixture(scope="module")
def images(spark):
    df, _ = images_spark_df(spark, 60, seed=5, partitions=4)
    return df.localCheckpoint()


def test_image_features(spark, images):
    feats = image_features(images).collect()
    assert len(feats) == 60
    for r in feats[:5]:
        assert r["w"] == r["h"] == 32
        assert 0 <= r["mean_r"] <= 255
        assert r["std_gray"] > 0
    # phash recomputed from bytes matches the stored column
    stored = {r["image_id"]: r["phash"] for r in images.collect()}
    for r in feats:
        assert r["phash"] == stored[r["image_id"]]


def test_resize_images(spark, images):
    out = resize_images(images, 8).collect()
    assert len(out) == 60
    for r in out[:5]:
        px = decode_png(bytes(r["bytes"]))
        assert px.shape == (8, 8, 3)
        assert r["fmt"] == "png"


def test_audio_features_stub(spark):
    pcm = (np.sin(np.linspace(0, 100, 16000)) * 20000).astype("<i2")
    df = spark.createDataFrame([("clip1", bytearray(pcm.tobytes()))],
                               "clip_id string, bytes binary")
    row = audio_features(df).first()
    assert row["sample_rate"] == 16000
    assert row["n_samples"] == 16000
    assert 0.3 < row["rms"] < 0.7


def test_frame_sample_stub(spark):
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
              for _ in range(25)]
    buf = pack_fake_video(frames)
    df = spark.createDataFrame([("vid1", bytearray(buf))],
                               "video_id string, bytes binary")
    out = frame_sample(df, every_n=10).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] \
        == [0, 10, 20]
    px = decode_png(bytes(out[0]["bytes"]))
    assert px.shape == (16, 16, 3)
