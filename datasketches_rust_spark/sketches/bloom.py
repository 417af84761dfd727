"""Bloom filter — packed-uint64 bit array with Kirsch-Mitzenmacher double
hashing, mirroring the reference semantics (bloom/sketch.rs, bloom/mod.rs:
110-121: "two hash functions simulate k via h1 + i*h2") with XXHash64 as
the base hash (hash/xxhash.rs), vectorized over key batches.

Spark role: the JVM ``df.stat.bloomFilter`` is Scala-only from PySpark's
perspective, so this kernel backs (a) a bloom-filter UDAF and (b) the
candidate-pair pre-filter in the dedup pipeline (probe already-clustered
ids before the expensive verify join — SURVEY.md §2.4 contains row).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from datasketches_rust_spark.hashing import (DEFAULT_SEED, compute_seed_hash,
                                             xxhash64_matrix)
from datasketches_rust_spark.sketches import serde


def suggest_num_bits(max_items: int, fpp: float) -> int:
    """Optimal m = -n ln(p) / (ln 2)^2, rounded up to a multiple of 64
    (bloom/builder.rs:183-204)."""
    m = math.ceil(-max_items * math.log(fpp) / (math.log(2) ** 2))
    return ((m + 63) // 64) * 64


def suggest_num_hashes(max_items: int, num_bits: int) -> int:
    """Optimal k = m/n ln 2 (bloom/builder.rs:205-229)."""
    return max(1, round(num_bits / max_items * math.log(2)))


@dataclass
class BloomFilter:
    num_bits: int
    num_hashes: int
    seed: int = DEFAULT_SEED
    words: np.ndarray = None  # (num_bits/64,) uint64

    def __post_init__(self) -> None:
        if self.num_bits % 64:
            raise ValueError("num_bits must be a multiple of 64")
        if self.words is None:
            self.words = np.zeros(self.num_bits // 64, dtype=np.uint64)

    @classmethod
    def with_accuracy(cls, max_items: int, fpp: float,
                      seed: int = DEFAULT_SEED) -> "BloomFilter":
        m = suggest_num_bits(max_items, fpp)
        return cls(m, suggest_num_hashes(max_items, m), seed)

    # -- hashing -------------------------------------------------------------
    def _base_hashes(self, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(N, L) uint8 keys -> (h1, h2). Double-hashing bases from two
        xxhash64 passes with derived seeds (bloom/sketch.rs:499 scheme)."""
        h1 = xxhash64_matrix(data, self.seed)
        h2 = xxhash64_matrix(data, self.seed ^ 0x9E3779B97F4A7C15) | np.uint64(1)
        return h1, h2

    def _bit_positions(self, data: np.ndarray) -> np.ndarray:
        """(N, num_hashes) bit indices: (h1 + i*h2) mod m."""
        h1, h2 = self._base_hashes(data)
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(self.num_bits))

    # -- ops -----------------------------------------------------------------
    def insert_keys(self, data: np.ndarray) -> "BloomFilter":
        bits = self._bit_positions(data).ravel()
        np.bitwise_or.at(self.words, (bits >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (bits & np.uint64(63)))
        return self

    def contains_keys(self, data: np.ndarray) -> np.ndarray:
        """(N,) bool — no false negatives (bloom/sketch.rs:71-78)."""
        bits = self._bit_positions(data)
        w = self.words[(bits >> np.uint64(6)).astype(np.int64)]
        set_ = (w >> (bits & np.uint64(63))) & np.uint64(1)
        return set_.all(axis=1)

    def contains_and_insert_keys(self, data: np.ndarray) -> np.ndarray:
        """(N,) bool — per key, whether it was (probably) present BEFORE
        this call, then insert it (bloom/sketch.rs:97-102). Sequential
        one-at-a-time semantics: a duplicate later in the batch reports
        True because the earlier occurrence inserted it — matching the
        reference's per-item loop, not a batch snapshot."""
        bits = self._bit_positions(data)
        word_idx = (bits >> np.uint64(6)).astype(np.int64)
        masks = np.uint64(1) << (bits & np.uint64(63))
        out = np.empty(len(data), dtype=bool)
        for i in range(len(data)):
            w = self.words[word_idx[i]]
            out[i] = bool(np.all(w & masks[i]))
            np.bitwise_or.at(self.words, word_idx[i], masks[i])
        return out

    def union(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        return BloomFilter(self.num_bits, self.num_hashes, self.seed,
                           self.words | other.words)

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        return BloomFilter(self.num_bits, self.num_hashes, self.seed,
                           self.words & other.words)

    def invert(self) -> "BloomFilter":
        return BloomFilter(self.num_bits, self.num_hashes, self.seed,
                           ~self.words)

    def _check_compat(self, other: "BloomFilter") -> None:
        if (self.num_bits, self.num_hashes, self.seed) != \
                (other.num_bits, other.num_hashes, other.seed):
            raise serde.SketchDecodeError("incompatible bloom configs")

    # -- stats (bloom/sketch.rs:263-306) --------------------------------------
    def bits_used(self) -> int:
        from datasketches_rust_spark.sketches.util import popcount64
        return int(popcount64(self.words).sum())

    def load_factor(self) -> float:
        return self.bits_used() / self.num_bits

    def estimated_fpp(self) -> float:
        return self.load_factor() ** self.num_hashes

    VERSION = 1

    def serialize(self) -> bytes:
        hdr = serde.pack_header(serde.FAMILY_BLOOM, self.VERSION,
                                compute_seed_hash(self.seed))
        meta = np.array([self.num_bits, self.num_hashes], dtype="<u4").tobytes()
        return hdr + meta + self.words.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "BloomFilter":
        off = serde.unpack_header(buf, serde.FAMILY_BLOOM, cls.VERSION,
                                  compute_seed_hash(seed))
        serde.need(buf, off, 8)
        num_bits, num_hashes = np.frombuffer(buf, "<u4", 2, off)
        words, _ = serde.take_u64s(buf, off + 8, int(num_bits) // 64)
        return cls(int(num_bits), int(num_hashes), seed, words.copy())
