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


class TestWavCodec:
    """Real WAV/RIFF PCM codec (multimodal.decode_wav / encode_wav)."""

    def test_roundtrip_pcm16(self):
        from datasketches_rust_spark.multimodal import decode_wav, encode_wav
        sr = 22050
        t = np.linspace(0, 1, sr, endpoint=False)
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        back, sr_back = decode_wav(encode_wav(x, sr))
        assert sr_back == sr and back.size == sr
        # PCM16 quantization error bound: 1/32767 per sample
        assert np.abs(back - x).max() < 1.0 / 32000

    def test_stereo_mixdown_and_float32(self):
        from datasketches_rust_spark.multimodal import decode_wav
        # hand-assemble a stereo float32 WAV: L = 0.5, R = -0.5 -> mono 0
        data = np.zeros(200, dtype="<f4")
        data[0::2], data[1::2] = 0.5, -0.5
        body = data.tobytes()
        fmt = (np.array([3, 2], "<u2").tobytes()
               + np.uint32(8000).astype("<u4").tobytes()
               + np.uint32(8000 * 8).astype("<u4").tobytes()
               + np.array([8, 32], "<u2").tobytes())
        buf = (b"RIFF" + np.uint32(36 + len(body)).astype("<u4").tobytes()
               + b"WAVEfmt " + np.uint32(16).astype("<u4").tobytes() + fmt
               + b"data" + np.uint32(len(body)).astype("<u4").tobytes()
               + body)
        x, sr = decode_wav(buf)
        assert sr == 8000 and x.size == 100
        assert np.abs(x).max() == 0.0

    def test_skips_unknown_chunks(self):
        from datasketches_rust_spark.multimodal import decode_wav, encode_wav
        wav = encode_wav(np.zeros(10), 8000)
        # splice a LIST metadata chunk between fmt and data
        head, data_chunk = wav[:36], wav[36:]
        extra = b"LIST" + np.uint32(4).astype("<u4").tobytes() + b"INFO"
        x, sr = decode_wav(head + extra + data_chunk)
        assert sr == 8000 and x.size == 10

    def test_malformed_rejected(self):
        from datasketches_rust_spark.multimodal import decode_wav
        import pytest as _pytest
        for bad in (b"", b"RIFFxxxxWAVE", b"nope" * 10,
                    b"RIFF\x00\x00\x00\x00WAVEdata\x04\x00\x00\x00abcd"):
            with _pytest.raises(ValueError):
                decode_wav(bad)

    def test_resample_preserves_duration_and_tone(self):
        from datasketches_rust_spark.multimodal import resample_audio
        sr_in, sr_out = 16000, 8000
        t = np.linspace(0, 1, sr_in, endpoint=False)
        x = np.sin(2 * np.pi * 100 * t)
        y = resample_audio(x, sr_in, sr_out)
        assert y.size == sr_out
        # same RMS for a tone far below both Nyquists
        assert abs(np.sqrt((y ** 2).mean()) - np.sqrt((x ** 2).mean())) < 0.01


def test_audio_features_real_wav(spark):
    """audio_features must route RIFF payloads through the REAL decoder:
    sample_rate comes from the wav header, not the 16 kHz raw fallback."""
    from datasketches_rust_spark.multimodal import encode_wav
    sr = 44100
    t = np.linspace(0, 0.5, sr // 2, endpoint=False)
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), sr)
    df = spark.createDataFrame([("clipw", bytearray(wav))],
                               "clip_id string, bytes binary")
    row = audio_features(df).first()
    assert row["sample_rate"] == sr
    assert row["n_samples"] == sr // 2
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(row["rms"] - 0.5 / np.sqrt(2)) < 0.01
