"""Small shared integer kernels (exact, no float round-trips)."""

from __future__ import annotations

import numpy as np

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (byte-table, exact)."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POP8[b].reshape(-1, 8).sum(axis=1).astype(np.int64).reshape(np.shape(x))


def clz64(x: np.ndarray) -> np.ndarray:
    """Count-leading-zeros of uint64 via bit smearing + popcount.

    Integer-exact (no log2 float rounding hazards); clz64(0) == 64.
    Needed for the HLL coupon value = lz(h2) (hll/mod.rs:160-247).
    """
    x = np.ascontiguousarray(x, dtype=np.uint64).copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return 64 - popcount64(x)
