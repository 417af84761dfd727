"""CPC (Compressed Probabilistic Counting / FM85) sketch — bit-matrix
re-expression of the reference CPC family (cpc/sketch.rs, cpc/union.rs,
cpc/estimator.rs; Lang, arXiv:1708.06839).

Representation choice: the reference maintains a flavor ladder
(EMPTY->SPARSE->HYBRID->PINNED->SLIDING, cpc/mod.rs:59-92) with a pair
table of surprising values plus an 8-bit sliding window per row
(cpc/sketch.rs:258-389) — a heap-byte optimization for one-at-a-time
stream updates. Its own union converts everything to the full k x 64 bit
matrix anyway (cpc/union.rs:226-300, build_bit_matrix at sketch.rs:418).
In an Arrow-batched, merge-heavy engine the bit matrix IS the natural
resident form: updates are vectorized bitwise-ors, unions are row-wise
ors (with mod-k row folding for mixed lg_k, exactly
cpc/union.rs:353-389), and the matrix is what every estimator consumes.
Flavor and window offset remain as derived functions for parity
(determine_flavor / determine_correct_offset, cpc/mod.rs:76-102).

Estimators: HIP (Historical Inverse Probability) for single-stream
sketches — sequential accumulation over NOVEL coupons only, in stream
order, with the reference's kxp register refresh (sketch.rs:250-256,
396-416); ICON for anything merged (estimator.rs:391-429: degree-19
polynomial per lg_k below C <= 5.6..5.7*K, exponential approximation
above). Confidence intervals use the published characterization
quantiles for lg_k <= 14 and the asymptotic constants above
(estimator.rs:99-211). The entropy compression layer
(cpc/compression.rs + generated tables) is out of scope — wire-size
optimality is not a query capability; serde uses the repo's own tagged
format with a sparse/dense payload split.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from datasketches_rust_spark.hashing import (DEFAULT_SEED, compute_seed_hash,
                                             murmur3_x64_128_matrix)
from datasketches_rust_spark.sketches import serde
from datasketches_rust_spark.sketches import cpc_tables as T
from datasketches_rust_spark.sketches.util import clz64, popcount64

DEFAULT_LG_K = 11
MIN_LG_K, MAX_LG_K = 4, 26

# KXP_BYTE_TABLE[b] = 1 - 2^-8 - sum(2^-(i+1) for set bits i of b): the
# per-byte contribution used by the kxp refresh (kxp_byte_lookup.rs,
# sketch.rs:396-416). Computed, not transcribed — the closed form is exact.
_KXP_BYTE_TABLE = np.array(
    [1.0 - 2.0 ** -8 - sum(2.0 ** -(i + 1) for i in range(8) if (b >> i) & 1)
     for b in range(256)], dtype=np.float64)

# exponential-regime constant, estimator.rs:388
_ICON_EXP_CONSTANT = 0.7940236163830469
_ICON_ERROR_CONSTANT = float(np.log(2.0))
_HIP_ERROR_CONSTANT = 0.588705011257737332  # sqrt(ln2 / 2)


def determine_flavor(lg_k: int, num_coupons: int) -> str:
    """cpc/mod.rs:76-92 thresholds on C relative to K."""
    k = 1 << lg_k
    c = num_coupons
    if c == 0:
        return "EMPTY"
    if 32 * c < 3 * k:
        return "SPARSE"
    if 2 * c < k:
        return "HYBRID"
    if 8 * c < 27 * k:
        return "PINNED"
    return "SLIDING"


def determine_correct_offset(lg_k: int, num_coupons: int) -> int:
    """Window offset = floor((8C - 19K) / 8K), clamped at 0
    (cpc/mod.rs:94-102)."""
    k = 1 << lg_k
    tmp = (num_coupons << 3) - 19 * k
    return 0 if tmp < 0 else tmp >> (lg_k + 3)


def icon_estimate(lg_k: int, num_coupons: int) -> float:
    """ICON estimator (estimator.rs:391-429): survives unions."""
    if not (MIN_LG_K <= lg_k <= MAX_LG_K):
        raise ValueError(f"lg_k {lg_k} out of [{MIN_LG_K}, {MAX_LG_K}]")
    if num_coupons == 0:
        return 0.0
    if num_coupons == 1:
        return 1.0
    k = float(1 << lg_k)
    c = float(num_coupons)
    threshold_factor = 5.7 if lg_k < 14 else 5.6
    if c > threshold_factor * k:
        return _ICON_EXP_CONSTANT * k * 2.0 ** (c / k)
    start = T.ICON_POLY_NUM_COEF * (lg_k - T.ICON_MIN_LG_K)
    coefs = T.ICON_POLYNOMIAL_COEFFICIENTS[start:start + T.ICON_POLY_NUM_COEF]
    x = c / (2.0 * k)  # the 2.0 is baked into the table
    factor = 0.0
    for a in coefs[::-1]:  # Horner, highest degree first
        factor = factor * x + a
    ratio = c / k
    term = 1.0 + ratio * ratio * ratio / 66.774757  # baked into the table
    result = c * factor * term
    return result if result >= c else c


def _side_quantile(table: np.ndarray, lg_k: int, kappa: int,
                   default: float) -> float:
    """Characterization quantile x/10000 for lg_k in [4,14], else the
    asymptotic constant (estimator.rs:127-211 pattern)."""
    if not 1 <= kappa <= 3:
        raise ValueError("kappa must be 1, 2 or 3")
    if lg_k <= 14:
        return float(table[3 * (lg_k - 4) + (kappa - 1)]) / 10000.0
    return default


def icon_confidence_lb(lg_k: int, num_coupons: int, kappa: int) -> float:
    if num_coupons == 0:
        return 0.0
    x = _side_quantile(T.ICON_HIGH_SIDE_DATA, lg_k, kappa,
                       _ICON_ERROR_CONSTANT)
    eps = kappa * x / np.sqrt(float(1 << lg_k))
    result = icon_estimate(lg_k, num_coupons) / (1.0 + eps)
    return max(result, float(num_coupons))


def icon_confidence_ub(lg_k: int, num_coupons: int, kappa: int) -> float:
    if num_coupons == 0:
        return 0.0
    x = _side_quantile(T.ICON_LOW_SIDE_DATA, lg_k, kappa,
                       _ICON_ERROR_CONSTANT)
    eps = kappa * x / np.sqrt(float(1 << lg_k))
    return float(np.ceil(icon_estimate(lg_k, num_coupons) / (1.0 - eps)))


def hip_confidence_lb(lg_k: int, num_coupons: int, hip: float,
                      kappa: int) -> float:
    if num_coupons == 0:
        return 0.0
    x = _side_quantile(T.HIP_HIGH_SIDE_DATA, lg_k, kappa,
                       _HIP_ERROR_CONSTANT)
    eps = kappa * x / np.sqrt(float(1 << lg_k))
    return max(hip / (1.0 + eps), float(num_coupons))


def hip_confidence_ub(lg_k: int, num_coupons: int, hip: float,
                      kappa: int) -> float:
    if num_coupons == 0:
        return 0.0
    x = _side_quantile(T.HIP_LOW_SIDE_DATA, lg_k, kappa,
                       _HIP_ERROR_CONSTANT)
    eps = kappa * x / np.sqrt(float(1 << lg_k))
    return float(np.ceil(hip / (1.0 - eps)))


@dataclass
class CpcSketch:
    """Bit-matrix CPC sketch. ``matrix[row]`` holds 64 coupon bits; coupon
    (row, col) from h1's low lg_k bits and clz(h2) clipped to 63
    (sketch.rs:193-209). merge_flag selects ICON over HIP
    (sketch.rs:76-86)."""

    lg_k: int = DEFAULT_LG_K
    seed: int = DEFAULT_SEED
    matrix: np.ndarray = None  # (2^lg_k,) uint64
    num_coupons: int = 0
    merge_flag: bool = False
    kxp: float = None
    hip_est_accum: float = 0.0

    def __post_init__(self) -> None:
        if not (MIN_LG_K <= self.lg_k <= MAX_LG_K):
            raise ValueError(f"lg_k {self.lg_k} out of [{MIN_LG_K}, {MAX_LG_K}]")
        if self.matrix is None:
            self.matrix = np.zeros(1 << self.lg_k, dtype=np.uint64)
        if self.kxp is None:
            self.kxp = float(1 << self.lg_k)
        self._coupons_at_refresh = self.num_coupons

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def is_empty(self) -> bool:
        return self.num_coupons == 0

    def flavor(self) -> str:
        return determine_flavor(self.lg_k, self.num_coupons)

    def window_offset(self) -> int:
        return determine_correct_offset(self.lg_k, self.num_coupons)

    # -- update ---------------------------------------------------------------

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> "CpcSketch":
        """Batch update from (h1, h2) murmur128 pairs. Novelty is detected
        vectorized against the matrix; the HIP register advances
        sequentially over the novel coupons only, in stream order — total
        novel coupons over a sketch's lifetime is O(K), not O(n), so the
        scalar loop is bounded regardless of input size."""
        cols = np.minimum(clz64(np.asarray(h2, dtype=np.uint64)), 63) \
            .astype(np.uint64)
        rows = (np.asarray(h1, dtype=np.uint64)
                & np.uint64(self.k - 1)).astype(np.uint64)
        row_col = ((rows << np.uint64(6)) | cols).astype(np.uint32)
        # avoid the reference pair-table's reserved "empty" value the same
        # way it does (sketch.rs:203-207) so coupon streams agree
        row_col[row_col == np.uint32(0xFFFFFFFF)] ^= np.uint32(64)

        # first-occurrence dedupe preserving stream order
        _, first = np.unique(row_col, return_index=True)
        first.sort(kind="stable")
        rc = row_col[first]
        r = (rc >> np.uint32(6)).astype(np.int64)
        c = (rc & np.uint32(63)).astype(np.uint64)
        bit = np.uint64(1) << c
        novel = (self.matrix[r] & bit) == 0
        r, c, bit = r[novel], c[novel], bit[novel]
        if r.size == 0:
            return self
        if not self.merge_flag:
            self._update_hip(c)
        np.bitwise_or.at(self.matrix, r, bit)
        self.num_coupons += int(r.size)
        # mirror the reference's periodic kxp refresh (every 8th window
        # move ~= every K novel coupons, sketch.rs:356-359): recompute the
        # register from the matrix to cancel float drift
        if (not self.merge_flag
                and self.num_coupons - self._coupons_at_refresh >= self.k):
            self.refresh_kxp()
        return self

    def update_keys(self, data: np.ndarray) -> "CpcSketch":
        """(N, L) uint8 key matrix -> murmur128 -> coupons."""
        h1, h2 = murmur3_x64_128_matrix(data, self.seed)
        return self.update_hashes(h1, h2)

    def _update_hip(self, novel_cols: np.ndarray) -> None:
        """HIP accumulator (sketch.rs:250-256): per novel coupon, in
        order: accum += k/kxp; kxp -= 2^-(col+1)."""
        deltas = 0.5 ** (novel_cols.astype(np.float64) + 1.0)
        kxp = self.kxp
        acc = self.hip_est_accum
        kf = float(self.k)
        for d in deltas:
            acc += kf / kxp
            kxp -= d
        self.kxp = kxp
        self.hip_est_accum = acc

    def refresh_kxp(self) -> None:
        """Recompute kxp from the matrix with byte-bucketed summation for
        numerical accuracy (sketch.rs:396-416): kxp = sum over rows of
        (1 - sum(2^-(col+1) for set cols))."""
        mat_bytes = self.matrix.astype("<u8").view(np.uint8).reshape(-1, 8)
        byte_sums = _KXP_BYTE_TABLE[mat_bytes].sum(axis=0)  # (8,)
        total = 0.0
        for j in range(7, -1, -1):  # reverse order, smallest terms first
            total += (2.0 ** (-8.0 * j)) * byte_sums[j]
        self.kxp = total
        self._coupons_at_refresh = self.num_coupons

    # -- estimate -------------------------------------------------------------

    def estimate(self) -> float:
        """HIP when never merged, ICON otherwise (estimator.rs:91-97)."""
        if not self.merge_flag:
            return self.hip_est_accum
        return icon_estimate(self.lg_k, self.num_coupons)

    def lower_bound(self, kappa: int = 2) -> float:
        if not self.merge_flag:
            return hip_confidence_lb(self.lg_k, self.num_coupons,
                                     self.hip_est_accum, kappa)
        return icon_confidence_lb(self.lg_k, self.num_coupons, kappa)

    def upper_bound(self, kappa: int = 2) -> float:
        if not self.merge_flag:
            return hip_confidence_ub(self.lg_k, self.num_coupons,
                                     self.hip_est_accum, kappa)
        return icon_confidence_ub(self.lg_k, self.num_coupons, kappa)

    def validate(self) -> bool:
        """num_coupons must equal the number of set matrix bits
        (sketch.rs:719-723)."""
        return int(popcount64(self.matrix).sum()) == self.num_coupons

    def union(self, other: "CpcSketch") -> "CpcSketch":
        """Convenience two-way merge; result uses ICON (merge_flag)."""
        u = CpcUnion(max(self.lg_k, other.lg_k), self.seed)
        u.update(self)
        u.update(other)
        return u.to_sketch()

    # -- serde ----------------------------------------------------------------

    VERSION = 1

    def serialize(self) -> bytes:
        """Own tagged format (no entropy compression): sparse row_col list
        while C*4 < K*8 bytes, dense matrix words otherwise."""
        import struct
        hdr = serde.pack_header(serde.FAMILY_CPC, self.VERSION,
                                compute_seed_hash(self.seed))
        has_hip = not self.merge_flag
        flags = 1 if has_hip else 0
        sparse = self.num_coupons * 4 < self.k * 8
        if sparse:
            flags |= 2
        out = [hdr, struct.pack("<BBI", self.lg_k, flags, self.num_coupons)]
        if has_hip:
            out.append(struct.pack("<dd", self.kxp, self.hip_est_accum))
        if sparse:
            nz = np.nonzero(self.matrix)[0].astype(np.uint64)
            rcs = []
            for row in nz:
                word = int(self.matrix[row])
                while word:
                    col = (word & -word).bit_length() - 1
                    word &= word - 1
                    rcs.append((int(row) << 6) | col)
            arr = np.array(rcs, dtype="<u4")
            assert arr.size == self.num_coupons
            out.append(arr.tobytes())
        else:
            out.append(self.matrix.astype("<u8").tobytes())
        return b"".join(out)

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "CpcSketch":
        import struct
        off = serde.unpack_header(buf, serde.FAMILY_CPC, cls.VERSION,
                                  compute_seed_hash(seed))
        serde.need(buf, off, 6)
        lg_k, flags, num_coupons = struct.unpack_from("<BBI", buf, off)
        off += 6
        if not (MIN_LG_K <= lg_k <= MAX_LG_K):
            raise serde.SketchDecodeError(f"lg_k {lg_k} out of range")
        has_hip = bool(flags & 1)
        sparse = bool(flags & 2)
        kxp, hip = float(1 << lg_k), 0.0
        if has_hip:
            serde.need(buf, off, 16)
            kxp, hip = struct.unpack_from("<dd", buf, off)
            off += 16
        k = 1 << lg_k
        matrix = np.zeros(k, dtype=np.uint64)
        if sparse:
            serde.need(buf, off, 4 * num_coupons)
            rcs = np.frombuffer(buf, "<u4", num_coupons, off)
            rows = (rcs >> np.uint32(6)).astype(np.int64)
            if rows.size and rows.max() >= k:
                raise serde.SketchDecodeError("row_col out of range")
            bits = np.uint64(1) << (rcs & np.uint32(63)).astype(np.uint64)
            np.bitwise_or.at(matrix, rows, bits)
        else:
            serde.need(buf, off, 8 * k)
            matrix = np.frombuffer(buf, "<u8", k, off).astype(np.uint64)
        sk = cls(lg_k=lg_k, seed=seed, matrix=matrix,
                 num_coupons=num_coupons, merge_flag=not has_hip,
                 kxp=kxp, hip_est_accum=hip)
        if not sk.validate():
            raise serde.SketchDecodeError(
                "num_coupons does not match matrix bit count")
        return sk


def estimate_from_bytes(buf: bytes, seed: int = DEFAULT_SEED) -> float:
    """CpcWrapper analog (cpc/wrapper.rs:40-49): read the estimate
    straight from serialized bytes without inflating the bit matrix —
    num_coupons and the HIP registers live in the fixed-size header, so
    checkpoint metadata / shuffled partials can be inspected for free."""
    import struct
    off = serde.unpack_header(buf, serde.FAMILY_CPC, CpcSketch.VERSION,
                              compute_seed_hash(seed))
    serde.need(buf, off, 6)
    lg_k, flags, num_coupons = struct.unpack_from("<BBI", buf, off)
    if flags & 1:  # has HIP: the estimate is the accumulator itself
        serde.need(buf, off + 6, 16)
        _, hip = struct.unpack_from("<dd", buf, off + 6)
        return hip
    return icon_estimate(lg_k, num_coupons)


class CpcUnion:
    """CPC union (cpc/union.rs). Because the sketch is matrix-resident,
    the reference's four flavor cases collapse to one: fold the source
    matrix row-wise mod the union's K and OR it in
    (or_matrix_into_matrix, union.rs:381-389). Mixed lg_k reduces the
    union's K first (union.rs:304-337): valid because a coupon's column
    depends only on h2, and row folding is mod-k row masking."""

    def __init__(self, lg_k: int = DEFAULT_LG_K, seed: int = DEFAULT_SEED):
        if not (MIN_LG_K <= lg_k <= MAX_LG_K):
            raise ValueError(f"lg_k {lg_k} out of [{MIN_LG_K}, {MAX_LG_K}]")
        self.lg_k = lg_k
        self.seed = seed
        self.matrix = np.zeros(1 << lg_k, dtype=np.uint64)

    def update(self, sketch: CpcSketch) -> "CpcUnion":
        if sketch.seed != self.seed:
            raise serde.SketchDecodeError("seed mismatch in CPC union")
        if sketch.is_empty():
            return self
        if sketch.lg_k < self.lg_k:
            # reduce the union's K to match (downsampling densifies)
            self.matrix = np.bitwise_or.reduce(
                self.matrix.reshape(-1, 1 << sketch.lg_k), axis=0)
            self.lg_k = sketch.lg_k
        src = sketch.matrix
        if sketch.lg_k > self.lg_k:
            src = np.bitwise_or.reduce(
                src.reshape(-1, 1 << self.lg_k), axis=0)
        self.matrix |= src
        return self

    def num_coupons(self) -> int:
        return int(popcount64(self.matrix).sum())

    def to_sketch(self) -> CpcSketch:
        """Result sketch: merge_flag set, HIP fields zeroed — ICON is the
        estimator that survives unions (union.rs:199-204)."""
        return CpcSketch(lg_k=self.lg_k, seed=self.seed,
                         matrix=self.matrix.copy(),
                         num_coupons=self.num_coupons(),
                         merge_flag=True, kxp=0.0, hip_est_accum=0.0)
