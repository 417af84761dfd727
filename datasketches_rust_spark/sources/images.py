"""Deterministic synthetic image+caption fixture (FIXTURES.md F1).

Schema fixed by BASELINE.json input_hint:
(image_id string, bytes binary, w int, h int, fmt string, caption string,
 phash long). Fully seeded (numpy PCG64), no time/order dependence; the
same (seed, n_rows) always produces byte-identical tables.

Duplicate injection (FIXTURES F1): a configured fraction of rows belong to
multi-row clusters (sizes 2-8, geometric), members derived from the seed
row as:
  exact        — identical pixels + caption, new image_id
  near-visual  — re-encode at jpeg quality 90-98 OR seeded noise bounded to
                 keep decoded-pixel PSNR >= 40 dB; caption identical
  near-caption — identical pixels; 1-2 token substitutions (5-gram shingle
                 Jaccard stays >= ~0.7)
Plus hard negatives: distinct image, caption sharing <= 2 tokens.
Ground truth (image_id, cluster_id) is emitted alongside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datasketches_rust_spark.sources.codec import (decode_image, encode_jpeg,
                                                   encode_png)
from datasketches_rust_spark.sources.phash import phash64

_CONS = "bcdfghklmnprstvz"
_VOWS = "aeiou"


def make_vocab(seed: int = 42, size: int = 200) -> list[str]:
    rng = np.random.default_rng(seed ^ 0xB0CA)
    vocab = set()
    while len(vocab) < size:
        n_syll = int(rng.integers(2, 4))
        w = "".join(_CONS[rng.integers(len(_CONS))] + _VOWS[rng.integers(len(_VOWS))]
                    for _ in range(n_syll))
        vocab.add(w)
    return sorted(vocab)


def _base_pixels(rng: np.random.Generator, i: int, size: int) -> np.ndarray:
    """Seeded uniform noise + gradient keyed by i (FIXTURES F1)."""
    noise = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    gy = np.linspace(0, (i * 37) % 200, size)[:, None]
    gx = np.linspace(0, (i * 53) % 200, size)[None, :]
    grad = ((gy + gx) / 2).astype(np.uint8)[..., None]
    return ((noise.astype(np.int32) + grad) % 256).astype(np.uint8)


def _base_caption(rng: np.random.Generator, vocab: list[str]) -> list[str]:
    n = int(rng.integers(8, 25))
    return [vocab[rng.integers(len(vocab))] for _ in range(n)]


def _encode(pixels: np.ndarray, fmt: str, quality: int = 95) -> bytes:
    return encode_png(pixels) if fmt == "png" else encode_jpeg(pixels, quality)


def generate_images(n_rows: int, seed: int = 42, size: int = 32,
                    dup_rate: float = 0.30
                    ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (images_df, truth_df). cluster_id = index of the cluster's
    seed row; singletons get their own row index."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    vocab = make_vocab(seed)

    # --- plan cluster structure -------------------------------------------
    target_members = int(dup_rate * n_rows)
    clusters: list[list[int]] = []  # row indices per cluster
    next_row = 0
    planned_members = 0
    plan: list[tuple] = []  # (kind, base_row or None)
    while next_row < n_rows:
        if planned_members < target_members and next_row + 1 < n_rows:
            size_c = min(2 + int(rng.geometric(0.5)) - 1, 8)
            size_c = min(size_c, n_rows - next_row)
            if size_c >= 2:
                base = next_row
                plan.append(("base", None))
                members = [base]
                for _ in range(size_c - 1):
                    kind = ("exact", "visual", "caption")[int(rng.integers(3))]
                    plan.append((kind, base))
                    members.append(base + len(members))
                clusters.append(members)
                next_row += size_c
                planned_members += size_c
                continue
        # singleton (5% of singletons become hard negatives)
        if rng.random() < 0.05 and clusters:
            plan.append(("hard_negative", clusters[-1][0]))
        else:
            plan.append(("single", None))
        next_row += 1

    # --- materialize rows ---------------------------------------------------
    pixels_cache: dict[int, np.ndarray] = {}
    caption_cache: dict[int, list[str]] = {}
    rows = []
    truth = []
    row_cluster = {}
    for members in clusters:
        for m in members:
            row_cluster[m] = members[0]

    for i, (kind, base) in enumerate(plan):
        if kind in ("base", "single", "hard_negative"):
            px = _base_pixels(rng, i, size)
            cap = _base_caption(rng, vocab)
            if kind == "hard_negative" and base is not None:
                # share exactly 2 tokens with the base caption
                bc = caption_cache[base]
                cap[0], cap[1] = bc[0], bc[1]
            fmt = "png" if rng.random() < 0.8 else "jpeg"
            quality = int(rng.integers(93, 99))
        elif kind == "exact":
            px = pixels_cache[base]
            cap = caption_cache[base]
            fmt, quality = "png", 95
        elif kind == "visual":
            src = pixels_cache[base]
            if rng.random() < 0.5:
                # jpeg re-encode at quality 90-98 (fake codec, PSNR>=40dB)
                px, fmt, quality = src, "jpeg", int(rng.integers(90, 99))
            else:
                # seeded noise bounded to +-2 -> PSNR >= 42 dB
                delta = rng.integers(-2, 3, size=src.shape, dtype=np.int32)
                px = np.clip(src.astype(np.int32) + delta, 0, 255).astype(np.uint8)
                fmt, quality = "png", 95
            cap = caption_cache[base]
        elif kind == "caption":
            px = pixels_cache[base]
            cap = list(caption_cache[base])
            for _ in range(int(rng.integers(1, 3))):
                cap[int(rng.integers(len(cap)))] = vocab[int(rng.integers(len(vocab)))]
            fmt, quality = "png", 95
        else:  # pragma: no cover
            raise AssertionError(kind)

        pixels_cache[i] = px
        caption_cache[i] = cap
        buf = _encode(px, fmt, quality)
        decoded = decode_image(buf, fmt)
        rows.append((f"img_{i:010d}", buf, size, size, fmt,
                     " ".join(cap), phash64(decoded)))
        truth.append((f"img_{i:010d}",
                      int(row_cluster.get(i, i))))

    images = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                         "fmt", "caption", "phash"])
    truth_df = pd.DataFrame(truth, columns=["image_id", "cluster_id"])
    # canonical cluster_id = min member row index (already the seed row)
    return images, truth_df


IMAGE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long")


def images_spark_df(spark, n_rows: int, seed: int = 42, size: int = 32,
                    dup_rate: float = 0.30, partitions: int | None = None):
    """(images DataFrame, truth DataFrame) in Spark."""
    pdf, truth = generate_images(n_rows, seed, size, dup_rate)
    df = spark.createDataFrame(pdf, schema=IMAGE_SCHEMA)
    tdf = spark.createDataFrame(truth, schema="image_id string, cluster_id long")
    if partitions:
        df = df.repartition(partitions)
    return df, tdf
