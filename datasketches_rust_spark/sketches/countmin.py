"""CountMin sketch — (num_hashes x num_buckets) counter matrix.

Mirrors countmin/sketch.rs semantics: one bucket per row via per-row hash
seeds (countmin/sketch.rs:405-410), estimate = min over rows
(:201-225), merge = elementwise add with config check (:246-259),
suggest_num_buckets(eps)=ceil(e/eps), suggest_num_hashes(conf)=
ceil(ln 1/(1-conf)) (:131-151). Vectorized: a batch of (key, weight)
updates lands via np.add.at per row.

Pipeline role: heavy-hitter detection over LSH band keys — the skew signal
that drives salting decisions (SURVEY.md §2.5 estimate row).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from datasketches_rust_spark.hashing import (DEFAULT_SEED, compute_seed_hash,
                                             hash_u64s)
from datasketches_rust_spark.sketches import serde


def suggest_num_buckets(relative_error: float) -> int:
    return math.ceil(math.e / relative_error)  # countmin/sketch.rs:131-138


def suggest_num_hashes(confidence: float) -> int:
    return math.ceil(math.log(1.0 / (1.0 - confidence)))  # :141-151


@dataclass
class CountMinSketch:
    num_hashes: int
    num_buckets: int
    seed: int = DEFAULT_SEED
    counts: np.ndarray = None  # (num_hashes, num_buckets) int64
    total_weight: int = 0

    def __post_init__(self) -> None:
        if self.counts is None:
            self.counts = np.zeros((self.num_hashes, self.num_buckets),
                                   dtype=np.int64)

    def relative_error(self) -> float:
        return math.e / self.num_buckets  # countmin/sketch.rs:117-119

    def _buckets(self, key_hashes: np.ndarray) -> np.ndarray:
        """(N,) uint64 pre-hashed keys -> (num_hashes, N) bucket indices,
        one independent hash per row (per-row murmur seeds,
        countmin/sketch.rs:405-410)."""
        rows = np.empty((self.num_hashes, len(key_hashes)), dtype=np.int64)
        for r in range(self.num_hashes):
            rows[r] = (hash_u64s(key_hashes, self.seed + r)
                       % np.uint64(self.num_buckets)).astype(np.int64)
        return rows

    def update_hashes(self, key_hashes: np.ndarray,
                      weights: np.ndarray | int = 1) -> "CountMinSketch":
        w = np.broadcast_to(np.asarray(weights, dtype=np.int64),
                            np.shape(key_hashes))
        rows = self._buckets(np.asarray(key_hashes, dtype=np.uint64))
        for r in range(self.num_hashes):
            np.add.at(self.counts[r], rows[r], w)
        self.total_weight += int(w.sum())
        return self

    def estimate_hashes(self, key_hashes: np.ndarray) -> np.ndarray:
        """(N,) estimates = min over rows (countmin/sketch.rs:201-211)."""
        rows = self._buckets(np.asarray(key_hashes, dtype=np.uint64))
        vals = np.stack([self.counts[r][rows[r]]
                         for r in range(self.num_hashes)])
        return vals.min(axis=0)

    def upper_bound_hashes(self, key_hashes: np.ndarray) -> np.ndarray:
        """est + eps * total_weight (countmin/sketch.rs:221-225)."""
        return (self.estimate_hashes(key_hashes)
                + int(self.relative_error() * self.total_weight))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.num_hashes, self.num_buckets, self.seed) != \
                (other.num_hashes, other.num_buckets, other.seed):
            raise serde.SketchDecodeError("incompatible countmin configs")
        return CountMinSketch(self.num_hashes, self.num_buckets, self.seed,
                              self.counts + other.counts,
                              self.total_weight + other.total_weight)

    def halve(self) -> "CountMinSketch":
        """Counter aging (countmin/sketch.rs:427-458) for streaming decay."""
        return CountMinSketch(self.num_hashes, self.num_buckets, self.seed,
                              self.counts // 2, self.total_weight // 2)

    VERSION = 1

    def serialize(self) -> bytes:
        hdr = serde.pack_header(serde.FAMILY_COUNTMIN, self.VERSION,
                                compute_seed_hash(self.seed))
        meta = np.array([self.num_hashes, self.num_buckets],
                        dtype="<u4").tobytes()
        tw = np.int64(self.total_weight).astype("<i8").tobytes()
        return hdr + meta + tw + self.counts.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "CountMinSketch":
        off = serde.unpack_header(buf, serde.FAMILY_COUNTMIN, cls.VERSION,
                                  compute_seed_hash(seed))
        serde.need(buf, off, 16)
        nh, nb = np.frombuffer(buf, "<u4", 2, off)
        tw = int(np.frombuffer(buf, "<i8", 1, off + 8)[0])
        n = int(nh) * int(nb)
        serde.need(buf, off + 16, 8 * n)
        counts = np.frombuffer(buf, "<i8", n, off + 16).reshape(int(nh),
                                                                int(nb))
        return cls(int(nh), int(nb), seed, counts.copy(), tw)
