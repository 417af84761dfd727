"""Deterministic synthetic image+caption fixture (FIXTURES.md F1).

Schema fixed by BASELINE.json input_hint:
(image_id string, bytes binary, w int, h int, fmt string, caption string,
 phash long). Fully seeded, no time/order dependence.

Scale design: generation is EMBARRASSINGLY PARALLEL. A cheap driver-side
``plan_clusters`` assigns every row index a (kind, base_index) role; all
pixel/caption/format draws are keyed by (seed, row_index) so any worker can
materialize any row slice independently — ``images_spark_df`` synthesizes
through ``mapInPandas`` over ``spark.range(n)``, which is how the 600k-row
bench table (and, on a real cluster, a 10^12-row table) is produced without
a single-node bottleneck.

Duplicate injection (FIXTURES F1): a configured fraction of rows belong to
multi-row clusters (sizes 2-8, geometric), members derived from the seed
row as:
  exact        — identical bytes + caption, new image_id
  near-visual  — re-encode at jpeg quality 90-98 (fake lossy codec,
                 sources/codec.py) OR +-2 seeded noise; PSNR >= 40 dB vs
                 the seed row's decoded pixels; caption identical
  near-caption — identical bytes; 1-2 token substitutions
Plus hard negatives: distinct image, caption sharing exactly 2 tokens.
Ground truth (image_id, cluster_id=seed row index) emitted alongside.
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


def plan_clusters(n_rows: int, seed: int = 42, dup_rate: float = 0.30
                  ) -> list[tuple[str, int]]:
    """Driver-side role plan: row i -> (kind, base_row). O(n) time/space,
    broadcast to workers. kinds: base/single/hard_negative/exact/visual/
    caption."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    target_members = int(dup_rate * n_rows)
    plan: list[tuple[str, int]] = []
    planned_members = 0
    last_base = -1
    next_row = 0
    while next_row < n_rows:
        if planned_members < target_members and next_row + 1 < n_rows:
            size_c = min(2 + int(rng.geometric(0.5)) - 1, 8)
            size_c = min(size_c, n_rows - next_row)
            if size_c >= 2:
                base = next_row
                plan.append(("base", base))
                for _ in range(size_c - 1):
                    kind = ("exact", "visual", "caption")[int(rng.integers(3))]
                    plan.append((kind, base))
                planned_members += size_c
                next_row += size_c
                last_base = base
                continue
        if rng.random() < 0.05 and last_base >= 0:
            plan.append(("hard_negative", last_base))
        else:
            plan.append(("single", next_row))
        next_row += 1
    return plan


def _row_rng(seed: int, i: int, salt: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64([seed, salt, i]))


def _base_pixels(seed: int, i: int, size: int) -> np.ndarray:
    """Seeded uniform noise + gradient keyed by i (FIXTURES F1)."""
    rng = _row_rng(seed, i, 1)
    noise = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    gy = np.linspace(0, (i * 37) % 200, size)[:, None]
    gx = np.linspace(0, (i * 53) % 200, size)[None, :]
    grad = ((gy + gx) / 2).astype(np.uint8)[..., None]
    return ((noise.astype(np.int32) + grad) % 256).astype(np.uint8)


def _base_caption(seed: int, i: int, vocab: list[str]) -> list[str]:
    rng = _row_rng(seed, i, 2)
    n = int(rng.integers(8, 25))
    return [vocab[rng.integers(len(vocab))] for _ in range(n)]


def _base_encoded(seed: int, i: int, size: int) -> tuple[bytes, str]:
    """The seed/single row's stored bytes — 80% png, else fake-jpeg q93-98."""
    rng = _row_rng(seed, i, 3)
    px = _base_pixels(seed, i, size)
    if rng.random() < 0.8:
        return encode_png(px), "png"
    return encode_jpeg(px, int(rng.integers(93, 99))), "jpeg"


def materialize_rows(indices, plan: list[tuple[str, int]], seed: int,
                     size: int, vocab: list[str]) -> pd.DataFrame:
    """Materialize the given row indices — callable from any worker."""
    rows = []
    for i in indices:
        kind, base = plan[i]
        if kind in ("base", "single", "hard_negative"):
            buf, fmt = _base_encoded(seed, i, size)
            cap = _base_caption(seed, i, vocab)
            if kind == "hard_negative":
                bc = _base_caption(seed, base, vocab)
                cap[0], cap[1] = bc[0], bc[1]
        elif kind in ("exact", "caption"):
            buf, fmt = _base_encoded(seed, base, size)
            cap = _base_caption(seed, base, vocab)
            if kind == "caption":
                rng = _row_rng(seed, i, 4)
                cap = list(cap)
                for _ in range(int(rng.integers(1, 3))):
                    cap[int(rng.integers(len(cap)))] = \
                        vocab[int(rng.integers(len(vocab)))]
        elif kind == "visual":
            bbuf, bfmt = _base_encoded(seed, base, size)
            src = decode_image(bbuf, bfmt)  # PSNR measured vs stored pixels
            rng = _row_rng(seed, i, 5)
            if rng.random() < 0.5:
                buf, fmt = encode_jpeg(src, int(rng.integers(90, 99))), "jpeg"
            else:
                delta = rng.integers(-2, 3, size=src.shape, dtype=np.int32)
                px = np.clip(src.astype(np.int32) + delta, 0,
                             255).astype(np.uint8)
                buf, fmt = encode_png(px), "png"
            cap = _base_caption(seed, base, vocab)
        else:  # pragma: no cover
            raise AssertionError(kind)

        decoded = decode_image(buf, fmt)
        cluster = base if kind in ("base", "exact", "visual", "caption") else i
        rows.append((f"img_{i:010d}", buf, size, size, fmt,
                     " ".join(cap), phash64(decoded), int(cluster)))
    return pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt",
                                       "caption", "phash", "cluster_id"])


def generate_images(n_rows: int, seed: int = 42, size: int = 32,
                    dup_rate: float = 0.30
                    ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Single-node convenience: (images_df, truth_df)."""
    plan = plan_clusters(n_rows, seed, dup_rate)
    vocab = make_vocab(seed)
    full = materialize_rows(range(n_rows), plan, seed, size, vocab)
    truth = full[["image_id", "cluster_id"]].copy()
    return full.drop(columns="cluster_id"), truth


IMAGE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long")


def images_spark_df(spark, n_rows: int, seed: int = 42, size: int = 32,
                    dup_rate: float = 0.30, partitions: int | None = None):
    """(images DataFrame, truth DataFrame), synthesized IN PARALLEL:
    spark.range(n) -> mapInPandas materializes each row slice on workers
    (plan + vocab broadcast via closure)."""
    plan = plan_clusters(n_rows, seed, dup_rate)
    vocab = make_vocab(seed)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            out = materialize_rows(pdf["id"].to_numpy(), plan, seed, size,
                                   vocab)
            yield out

    base = spark.range(0, n_rows, numPartitions=parts)
    full_schema = IMAGE_SCHEMA + ", cluster_id long"
    full = base.mapInPandas(gen, schema=full_schema)
    df = full.drop("cluster_id")
    tdf = full.select("image_id", "cluster_id")
    return df, tdf
