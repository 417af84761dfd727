"""Multimodal binary-column operators (task spec: image/audio/video as
opaque ``binary`` columns + typed metadata; decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages).

What is REAL here: schemas, partitioning, UDF signatures, batch shapes,
and the PNG/fake-JPEG decode path (sources/codec.py). What is STUBBED
(clearly marked): real JPEG/audio/video codecs — the sandbox has no
imaging libraries; each stub raises NotImplementedError or applies a
deterministic fake, and the surrounding Spark plumbing is tested either
way.

Batch-shape discipline for large binaries: callers should set
spark.sql.execution.arrow.maxRecordsPerBatch so that
(records x avg_blob_size) stays well under worker memory (config.py
defaults to 10k records; at 1 MB images use ~256).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from datasketches_rust_spark.sources.codec import (decode_image, encode_png,
                                                   psnr)

DECODED_META_SCHEMA = ("image_id string, w int, h int, fmt string, "
                       "mean_r double, mean_g double, mean_b double, "
                       "std_gray double, phash long")

RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def image_features(images: DataFrame) -> DataFrame:
    """Decode + per-channel feature extraction, one Arrow batch at a time.
    Input needs (image_id, bytes, fmt); output DECODED_META_SCHEMA."""
    from datasketches_rust_spark.sources.phash import phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = decode_image(bytes(r.bytes), r.fmt)
                gray = px.mean(axis=2)
                rows.append((r.image_id, px.shape[1], px.shape[0], r.fmt,
                             float(px[..., 0].mean()),
                             float(px[..., 1].mean()),
                             float(px[..., 2].mean()),
                             float(gray.std()), phash64(px)))
            yield pd.DataFrame(rows, columns=[
                "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                "std_gray", "phash"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=DECODED_META_SCHEMA)


def resize_images(images: DataFrame, out_size: int) -> DataFrame:
    """Decode -> block-mean/nearest resize -> re-encode PNG. Real kernel
    (numpy), real plumbing; output always PNG (lossless)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_size) * h) // out_size
                xi = (np.arange(out_size) * w) // out_size
                small = px[np.ix_(yi, xi)]
                rows.append((r.image_id, encode_png(small), out_size,
                             out_size, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                              "fmt"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# audio / video — plumbing real, codecs stubbed
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = ("clip_id string, sample_rate int, n_samples long, "
                         "rms double")
FRAME_SAMPLE_SCHEMA = ("video_id string, frame_idx int, bytes binary, "
                       "w int, h int, fmt string")


def _decode_audio_stub(buf: bytes) -> tuple[np.ndarray, int]:
    """STUB: no audio codec in-sandbox. Deterministic fake: interpret the
    byte payload as int16 PCM at 16 kHz. Swap for soundfile/ffmpeg in a
    real deployment."""
    n = (len(buf) // 2) * 2
    pcm = np.frombuffer(buf[:n], dtype="<i2").astype(np.float64) / 32768.0
    return pcm, 16000


def audio_features(clips: DataFrame, id_col: str = "clip_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Arrow-batched audio feature extraction over the stub decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pcm, sr = _decode_audio_stub(bytes(getattr(r, bytes_col)))
                rms = float(np.sqrt(np.mean(pcm ** 2))) if pcm.size else 0.0
                rows.append((getattr(r, id_col), sr, len(pcm), rms))
            yield pd.DataFrame(rows, columns=["clip_id", "sample_rate",
                                              "n_samples", "rms"])

    return clips.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample(videos: DataFrame, every_n: int = 10,
                 id_col: str = "video_id",
                 bytes_col: str = "bytes") -> DataFrame:
    """Video frame sampling. STUB container format: concatenated PNG
    frames length-prefixed with '<u4' (a deterministic fake 'video');
    real deployments swap the splitter for pyav/ffmpeg. The exploding
    mapInPandas shape (1 input row -> k output rows) is the real part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                buf = bytes(getattr(r, bytes_col))
                pos, idx = 0, 0
                while pos + 4 <= len(buf):
                    ln = int(np.frombuffer(buf, "<u4", 1, pos)[0])
                    frame = buf[pos + 4:pos + 4 + ln]
                    if idx % every_n == 0 and frame:
                        px = decode_image(frame, "png")
                        rows.append((getattr(r, id_col), idx, frame,
                                     px.shape[1], px.shape[0], "png"))
                    pos += 4 + ln
                    idx += 1
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx",
                                              "bytes", "w", "h", "fmt"])

    return videos.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA)


def pack_fake_video(frames: list[np.ndarray]) -> bytes:
    """Test helper: build the stub container from pixel arrays."""
    out = b""
    for px in frames:
        enc = encode_png(px)
        out += np.uint32(len(enc)).astype("<u4").tobytes() + enc
    return out
