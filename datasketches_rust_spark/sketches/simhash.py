"""SimHash — 64-bit similarity fingerprints for near-visual dedup.

Not present in the reference (its set sketches estimate set overlap; SimHash
estimates cosine/angular similarity), but required by the north_star:
"SimHash over phash bits catches near-visual dupes". Re-uses the engine's
murmur identity contract for feature hashing.

Vectorized: a batch of documents arrives as concatenated feature hashes +
weights + offsets (same segmented layout as minhash.signatures);
np.add.reduceat does the per-document weighted bit vote.
"""

from __future__ import annotations

import numpy as np

from datasketches_rust_spark.sketches.util import popcount64

_BITS = np.arange(64, dtype=np.uint64)


def simhash(feature_hashes: np.ndarray, offsets: np.ndarray,
            weights: np.ndarray | None = None) -> np.ndarray:
    """(total,) uint64 feature hashes + (n_docs+1,) offsets ->
    (n_docs,) uint64 fingerprints. weights default to 1."""
    h = np.ascontiguousarray(feature_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if h.size == 0 or n_docs == 0:
        return out

    w = (np.ones(h.size, dtype=np.float64) if weights is None
         else np.asarray(weights, dtype=np.float64))
    # (total, 64) signed votes: +w if bit set else -w
    bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.float64)
    votes = (2.0 * bits - 1.0) * w[:, None]

    counts = np.diff(offsets)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    sums = np.add.reduceat(votes, starts, axis=0)  # (n_nonempty, 64)
    fp = ((sums >= 0).astype(np.uint64) << _BITS[None, :]).sum(
        axis=1, dtype=np.uint64)
    out[nonempty] = fp
    return out


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between uint64 fingerprints."""
    return popcount64(np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64))


def hamming_bands(fp: np.ndarray, num_bands: int = 4) -> np.ndarray:
    """(N,) uint64 -> (N, num_bands) int64 band keys.

    Pigeonhole LSH for Hamming distance: two fingerprints within
    (num_bands - 1) bit flips agree exactly on at least one band, so
    grouping by (band_index, band_value) finds all pairs with
    hamming <= num_bands - 1 with recall 1.0 (then verify exact distance).
    """
    if 64 % num_bands:
        raise ValueError("num_bands must divide 64")
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)
    fp = np.asarray(fp, dtype=np.uint64)
    cols = [((fp >> np.uint64(i * width)) & mask).astype(np.int64)
            for i in range(num_bands)]
    return np.stack(cols, axis=1)
