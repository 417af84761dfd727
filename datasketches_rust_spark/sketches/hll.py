"""HLL sketch — dense 8-bit register re-expression of the reference HLL.

The reference carries a List->Set->Array representation ladder
(hll/sketch.rs:209-238) and 4/6/8-bit register packings (hll/mod.rs:134-149)
because it optimizes per-sketch heap bytes. At Arrow-batch granularity dense
uint8 registers are both simpler and faster (SURVEY.md §2.2 rationale), so:

- coupon math follows hll/mod.rs:160-247: murmur128 -> slot from h1's low
  lg_k bits, value = leading-zero-count(h2) capped + 1,
- update = np.maximum.at(regs, slot, value),
- union = register-wise max for equal lg_k (hll/union.rs:449-464), fold-max
  downsample when lg_k differs (hll/union.rs:491-513): slot' = slot mod k',
  exact because the value depends only on h2,
- estimator: standard HLL harmonic mean with linear-counting low-range
  correction (the reference's HIP/composite estimator with interpolation
  tables, hll/estimator.rs:41-121, buys ~sqrt(2) accuracy we don't need for
  dedup-scale cardinality; Spark's approx_count_distinct is our built-in
  cross-check).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from datasketches_rust_spark.hashing import (DEFAULT_SEED, compute_seed_hash,
                                             murmur3_x64_128_matrix)
from datasketches_rust_spark.sketches import serde
from datasketches_rust_spark.sketches.util import clz64

DEFAULT_LG_K = 12
_VALUE_CAP = 62  # hll/mod.rs:160-247 caps lz at 62, +1 => max 63


def coupons_from_keys(data: np.ndarray, lg_k: int,
                      seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """(N, L) uint8 keys -> (slots, values). Vectorized coupon computation
    (hll/mod.rs:160-247): slot = h1 & (2^lg_k - 1), value = min(lz(h2),62)+1."""
    h1, h2 = murmur3_x64_128_matrix(data, seed)
    slots = (h1 & np.uint64((1 << lg_k) - 1)).astype(np.int64)
    values = np.minimum(clz64(h2), _VALUE_CAP).astype(np.uint8) + np.uint8(1)
    return slots, values


@dataclass
class HllSketch:
    lg_k: int = DEFAULT_LG_K
    seed: int = DEFAULT_SEED
    regs: np.ndarray = None  # (2^lg_k,) uint8

    def __post_init__(self) -> None:
        if not (4 <= self.lg_k <= 21):  # hll/sketch.rs:90-103 bounds
            raise ValueError(f"lg_k {self.lg_k} out of [4, 21]")
        if self.regs is None:
            self.regs = np.zeros(1 << self.lg_k, dtype=np.uint8)

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def update_coupons(self, slots: np.ndarray, values: np.ndarray) -> "HllSketch":
        np.maximum.at(self.regs, slots, values)
        return self

    def update_keys(self, data: np.ndarray) -> "HllSketch":
        slots, values = coupons_from_keys(data, self.lg_k, self.seed)
        return self.update_coupons(slots, values)

    def estimate(self) -> float:
        m = float(self.k)
        regs = self.regs.astype(np.float64)
        raw = _alpha(self.k) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.regs == 0))
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return float(raw)

    def bounds(self, num_std_dev: int = 2) -> tuple[float, float]:
        """RSE-based bounds (hll/estimator.rs:133-160 analog):
        rse ~= 1.04/sqrt(k)."""
        est = self.estimate()
        rse = 1.04 / np.sqrt(self.k)
        d = num_std_dev * rse
        return est / (1.0 + d), est / max(1.0 - d, 1e-12)

    def union(self, other: "HllSketch") -> "HllSketch":
        if self.seed != other.seed:
            raise serde.SketchDecodeError("seed mismatch in HLL union")
        if self.lg_k == other.lg_k:
            regs = np.maximum(self.regs, other.regs)
            return HllSketch(self.lg_k, self.seed, regs)
        # downsample the finer sketch to the coarser lg_k
        # (hll/union.rs:491-513): fold slots mod k'
        small, large = ((self, other) if self.lg_k < other.lg_k
                        else (other, self))
        folded = large.regs.reshape(-1, small.k).max(axis=0)
        return HllSketch(small.lg_k, self.seed,
                         np.maximum(small.regs, folded))

    VERSION = 1

    def serialize(self) -> bytes:
        hdr = serde.pack_header(serde.FAMILY_HLL, self.VERSION,
                                compute_seed_hash(self.seed))
        return hdr + bytes([self.lg_k]) + self.regs.tobytes()

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "HllSketch":
        off = serde.unpack_header(buf, serde.FAMILY_HLL, cls.VERSION,
                                  compute_seed_hash(seed))
        serde.need(buf, off, 1)
        lg_k = buf[off]
        k = 1 << lg_k
        serde.need(buf, off + 1, k)
        regs = np.frombuffer(buf, np.uint8, k, off + 1).copy()
        return cls(lg_k=lg_k, seed=seed, regs=regs)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)
