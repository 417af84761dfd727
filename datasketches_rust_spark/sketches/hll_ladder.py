"""HLL representation ladder — List -> Set -> Array, plus the HLL4
nibble-packed array with cur_min offset + aux exception map.

Closes the two SURVEY §2.2 rows the dense-only HllSketch skipped:

- ``HllLadder`` carries the reference's mode machine
  (hll/sketch.rs:209-238): a small coupon LIST (capacity 8,
  list.rs:44-48) promotes on full to a coupon SET (initial lg_size 5,
  hash_set.rs:46-51) that grows at 75% load (mod.rs:157-158) until
  lg_size == lg_k - 3, then promotes to the register ARRAY; lg_k < 8
  skips SET entirely (sketch.rs:215-219). Sparse-mode estimates use the
  coupon cubic-interpolation tables (coupon_mapping.rs:24-73,
  container.rs:108-130) with COUPON_RSE = 0.409 / 2^13 bounds
  (mod.rs:153-154). Promotion seeds the dense HIP accumulator with the
  coupon estimate (sketch.rs:450-476 set_hip_accum).
- ``Hll4Array`` is the 4-bit packing with exception handling
  (array4.rs:18-250): raw nibble = value - cur_min, AUX_TOKEN=15 routes
  to an aux {slot: value} map, cur_min shifts up when num_at_cur_min
  hits 0 (shift_to_bigger_cur_min, array4.rs:207-250). Serializes to the
  reference HLL4 wire layout (array4.rs:370-420) — round-trips through
  ``compat.decode_hll``.

Coupons here are the reference's full 26-bit form
(mod.rs:216-247): ``(value << 26) | (addr26)`` with
addr26 = lo_hash & MASK_26 and value = min(clz(hi_hash), 62) + 1 —
lg_k-independent, so one coupon can feed sketches of any lg_k (the
array update folds the slot with ``& (k-1)``, array8.rs:80-100).

Spark integration note: the engine's hot aggregation path stays on the
dense ``HllSketch`` (SURVEY §2.2 rationale — Arrow-batch granularity
favors flat uint8 registers); the ladder is for small-cardinality
groups and wire/memory parity, exactly the niche it serves in the
reference.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from datasketches_rust_spark.hashing import (DEFAULT_SEED,
                                             murmur3_x64_128_matrix)
from datasketches_rust_spark.sketches import serde
from datasketches_rust_spark.sketches.hll import HllSketch, _cubic_interpolate
from datasketches_rust_spark.sketches.util import clz64

KEY_BITS_26 = 26
KEY_MASK_26 = (1 << KEY_BITS_26) - 1
AUX_TOKEN = 15

# coupon-count -> cardinality interpolation grid (coupon_mapping.rs:24-73;
# published characterization data, extracted verbatim)
COUPON_X_ARR = np.array([
    0.0, 1.0, 20.0, 400.0, 8000.0, 160000.0, 300000.0, 600000.0, 900000.0,
    1200000.0, 1500000.0, 1800000.0, 2100000.0, 2400000.0, 2700000.0,
    3000000.0, 3300000.0, 3600000.0, 3900000.0, 4200000.0, 4500000.0,
    4800000.0, 5100000.0, 5400000.0, 5700000.0, 6000000.0, 6300000.0,
    6600000.0, 6900000.0, 7200000.0, 7500000.0, 7800000.0, 8100000.0,
    8400000.0, 8700000.0, 9000000.0, 9300000.0, 9600000.0, 9900000.0,
    10200000.0])
COUPON_Y_ARR = np.array([
    0.0, 1.0, 20.00000094374026, 400.0003963713384, 8000.158929460209,
    160063.60677637596, 300223.70715976635, 600895.593385617,
    902016.8065120955, 1203588.498319951, 1505611.8245524743,
    1808087.9449319066, 2111018.0231759353, 2414403.22701425,
    2718244.728205189, 3022543.702552454, 3327301.329921909,
    3632518.794258454, 3938197.283602969, 4244337.990109356,
    4550942.110061649, 4858010.843891189, 5165545.396193897,
    5473546.975747645, 5782016.7955296505, 6090956.072734016,
    6400366.028789296, 6710247.889376201, 7020602.884445314,
    7331432.248234972, 7642737.219289148, 7954519.0404754765,
    8266778.959003342, 8579518.226442046, 8892738.098739047,
    9206439.836238328, 9520624.703698829, 9835293.97031292,
    10150448.909725029, 10466090.800050326])

COUPON_RSE = 0.409 / (1 << 13)  # mod.rs:153-154 (transition-point RSE)

LG_INIT_LIST_SIZE = 3    # list.rs:46
LG_INIT_SET_SIZE = 5     # hash_set.rs:48
RESIZE_NUM, RESIZE_DEN = 3, 4  # mod.rs:157-158 (grow at 3/4 load)


def coupons_from_keys26(data: np.ndarray,
                        seed: int = DEFAULT_SEED) -> np.ndarray:
    """(N, L) uint8 keys -> (N,) uint32 full 26-bit coupons
    (mod.rs:216-230)."""
    h1, h2 = murmur3_x64_128_matrix(data, seed)
    addr26 = (h1 & np.uint64(KEY_MASK_26)).astype(np.uint32)
    values = (np.minimum(clz64(h2), 62) + 1).astype(np.uint32)
    return (values << np.uint32(KEY_BITS_26)) | addr26


def coupon_slot_value(coupons: np.ndarray,
                      lg_k: int) -> tuple[np.ndarray, np.ndarray]:
    """Fold 26-bit coupons onto a 2^lg_k register file (array8.rs:80-84)."""
    c = coupons.astype(np.uint32, copy=False)
    slots = (c & np.uint32((1 << lg_k) - 1)).astype(np.int64)
    values = (c >> np.uint32(KEY_BITS_26)).astype(np.uint8)
    return slots, values


def coupon_estimate(num_coupons: int) -> float:
    """max(n, cubic-interp(n)) over the coupon grid
    (container.rs:108-112)."""
    n = float(num_coupons)
    x_arr, y_arr = COUPON_X_ARR, COUPON_Y_ARR
    last = len(x_arr) - 1
    if n >= x_arr[last]:
        # beyond the grid a sparse stage cannot persist (promotion fires
        # long before 10.2M coupons); extrapolate linearly from the tail
        return n * (y_arr[last] / x_arr[last])
    straddle = int(np.searchsorted(x_arr, n, side="right")) - 1
    offset = straddle
    if offset == last - 1:
        offset -= 2
    elif offset > 0:
        offset -= 1
    est = _cubic_interpolate(x_arr[offset:offset + 4],
                             y_arr[offset:offset + 4], n)
    return max(n, float(est))


def coupon_bounds(num_coupons: int,
                  num_std_dev: int = 2) -> tuple[float, float]:
    """(lb, ub) with the coupon-stage RSE (container.rs:114-130)."""
    if not 1 <= num_std_dev <= 3:
        raise ValueError("num_std_dev must be 1, 2 or 3")
    n = float(num_coupons)
    est = coupon_estimate(num_coupons)
    lb = max(est / (1.0 + num_std_dev * COUPON_RSE), n)
    ub = max(est / (1.0 - num_std_dev * COUPON_RSE), n)
    return lb, ub


# ---------------------------------------------------------------------------
# HLL4 array — 4-bit packing + cur_min offset + aux exception map
# ---------------------------------------------------------------------------

@dataclass
class Hll4Array:
    """Nibble-packed register file (array4.rs): raw stored value =
    actual - cur_min, capped at AUX_TOKEN which indirects to ``aux``.
    Maintains the same HIP estimator state as the dense sketch, so
    estimates are identical to an HllSketch fed the same coupons."""

    lg_k: int
    seed: int = DEFAULT_SEED
    nibbles: np.ndarray = None          # (k/2,) uint8: even slot = low nib
    cur_min: int = 0
    num_at_cur_min: int = None
    aux: dict = field(default_factory=dict)   # slot -> actual value
    hip_accum: float = 0.0
    kxq0: float = None
    kxq1: float = 0.0
    out_of_order: bool = False

    def __post_init__(self) -> None:
        if not (4 <= self.lg_k <= 21):
            raise ValueError(f"lg_k {self.lg_k} out of [4, 21]")
        k = 1 << self.lg_k
        if self.nibbles is None:
            self.nibbles = np.zeros(k >> 1, dtype=np.uint8)
        if self.num_at_cur_min is None:
            self.num_at_cur_min = k
        if self.kxq0 is None:
            self.kxq0 = float(k)

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def _get_raw(self, slot: int) -> int:
        b = int(self.nibbles[slot >> 1])
        return b & 0x0F if (slot & 1) == 0 else b >> 4

    def _put_raw(self, slot: int, raw: int) -> None:
        i = slot >> 1
        b = int(self.nibbles[i])
        if (slot & 1) == 0:
            self.nibbles[i] = (b & 0xF0) | (raw & 0x0F)
        else:
            self.nibbles[i] = (b & 0x0F) | (raw << 4)

    def get_value(self, slot: int) -> int:
        raw = self._get_raw(slot)
        if raw < AUX_TOKEN:
            return self.cur_min + raw
        return self.aux[slot]

    def _hip_update(self, old: int, new: int) -> None:
        if not self.out_of_order:
            self.hip_accum += self.k / (self.kxq0 + self.kxq1)
        for v, sign in ((old, -1.0), (new, 1.0)):
            w = sign * (1.0 if v == 0 else 2.0 ** (-float(v)))
            if v < 32:
                self.kxq0 += w
            else:
                self.kxq1 += w

    def update_coupons(self, coupons: np.ndarray) -> "Hll4Array":
        """Scalar per-raise loop (array4.rs:131-205) behind a vectorized
        lower-bound screen: rows that cannot beat cur_min + raw are
        dropped in bulk, and register raises are O(k log n) over a
        sketch's lifetime, so the loop is bounded."""
        slots, values = coupon_slot_value(np.asarray(coupons), self.lg_k)
        raw_all = np.empty(slots.size, dtype=np.uint8)
        even = (slots & 1) == 0
        nib = self.nibbles[(slots >> 1)]
        raw_all[even] = nib[even] & 0x0F
        raw_all[~even] = nib[~even] >> 4
        # screen vs the batch-start state; AUX_TOKEN rows always pass
        # (their true value lives in aux), the loop re-checks exactly
        lb = np.where(raw_all == AUX_TOKEN, 0,
                      raw_all.astype(np.int64) + self.cur_min)
        cand = np.nonzero((values > self.cur_min) & (values > lb))[0]
        for s, v in zip(slots[cand].tolist(), values[cand].tolist()):
            self._update_one(s, v)
        return self

    def _update_one(self, slot: int, new_value: int) -> None:
        if new_value <= self.cur_min:
            return
        raw = self._get_raw(slot)
        lower_bound = raw + self.cur_min
        if raw < AUX_TOKEN:
            if new_value <= lower_bound:
                return
            old_value = lower_bound
        else:
            old_value = self.aux[slot]
            if new_value <= old_value:
                return
        self._hip_update(old_value, new_value)
        shifted = new_value - self.cur_min
        if raw == AUX_TOKEN:
            # old is an exception; new must be too (array4.rs:171-180)
            self.aux[slot] = new_value
        elif shifted >= AUX_TOKEN:
            self._put_raw(slot, AUX_TOKEN)
            self.aux[slot] = new_value
        else:
            self._put_raw(slot, shifted)
        if old_value == self.cur_min:
            self.num_at_cur_min -= 1
            while self.num_at_cur_min == 0:
                self._shift_to_bigger_cur_min()

    def _shift_to_bigger_cur_min(self) -> None:
        """Decrement every raw nibble, rebuild aux (array4.rs:207-250) —
        vectorized over the packed array."""
        self.cur_min += 1
        lo = self.nibbles & 0x0F
        hi = self.nibbles >> 4
        lo = np.where(lo < AUX_TOKEN, lo - 1, lo)
        hi = np.where(hi < AUX_TOKEN, hi - 1, hi)
        self.nibbles = (lo | (hi << 4)).astype(np.uint8)
        self.num_at_cur_min = int(np.count_nonzero(lo == 0)
                                  + np.count_nonzero(hi == 0))
        new_aux = {}
        for slot, actual in self.aux.items():
            shifted = actual - self.cur_min
            if shifted < AUX_TOKEN:            # no longer an exception
                self._put_raw(slot, shifted)
            else:
                new_aux[slot] = actual
        self.aux = new_aux

    def registers(self) -> np.ndarray:
        """Expand to flat uint8 actual values (the dense representation)."""
        k = self.k
        raw = np.empty(k, dtype=np.uint8)
        raw[0::2] = self.nibbles & 0x0F
        raw[1::2] = self.nibbles >> 4
        regs = raw.astype(np.int64) + self.cur_min
        for slot, actual in self.aux.items():
            regs[slot] = actual
        return regs.astype(np.uint8)

    def to_hll8(self) -> HllSketch:
        """Dense HllSketch with identical registers + estimator state —
        estimate/bounds/union delegate here."""
        return HllSketch(lg_k=self.lg_k, seed=self.seed,
                         regs=self.registers(), hip_accum=self.hip_accum,
                         kxq0=self.kxq0, kxq1=self.kxq1,
                         out_of_order=self.out_of_order)

    def estimate(self) -> float:
        return self.to_hll8().estimate()

    def bounds(self, num_std_dev: int = 2) -> tuple[float, float]:
        return self.to_hll8().bounds(num_std_dev)

    # -- reference wire format (array4.rs:370-420) ---------------------------

    def serialize(self) -> bytes:
        out = bytearray()
        flags = 16 if self.out_of_order else 0     # OUT_OF_ORDER mask
        mode_byte = 2 | (0 << 2)                   # CUR_MODE_HLL, TGT_HLL4
        out += struct.pack("<BBBBBBBB", 10, 1, 7, self.lg_k, 0, flags,
                           self.cur_min, mode_byte)
        out += struct.pack("<ddd", self.hip_accum, self.kxq0, self.kxq1)
        aux_items = sorted(self.aux.items())
        out += struct.pack("<II", self.num_at_cur_min, len(aux_items))
        out += self.nibbles.tobytes()
        for slot, actual in aux_items:             # coupon-packed aux ints
            out += struct.pack("<I", (actual << KEY_BITS_26) | slot)
        return bytes(out)


# ---------------------------------------------------------------------------
# HLL6 array — 6-bit packing, no offset/exceptions (register max 62 fits)
# ---------------------------------------------------------------------------

@dataclass
class Hll6Array:
    """6-bit packed register file (array6.rs:18-120): value i lives at
    bits [6i, 6i+6) little-endian; no cur_min offset and no aux map
    because the maximum register value (62, from min(clz, 62) + 1 on a
    38-bit hi-hash budget) fits the field directly. Same HIP estimator
    discipline as Hll4Array/HllSketch, so estimates are identical for
    the same coupon stream. Storage: ~3k/4 bytes (hll/mod.rs:143-145)."""

    lg_k: int
    seed: int = DEFAULT_SEED
    packed: np.ndarray = None           # (((k*3)>>2)+1,) uint8
    hip_accum: float = 0.0
    kxq0: float = None
    kxq1: float = 0.0
    out_of_order: bool = False

    def __post_init__(self) -> None:
        if not (4 <= self.lg_k <= 21):
            raise ValueError(f"lg_k {self.lg_k} out of [4, 21]")
        k = 1 << self.lg_k
        if self.packed is None:
            self.packed = np.zeros(((k * 3) >> 2) + 1, dtype=np.uint8)
        if self.kxq0 is None:
            self.kxq0 = float(k)

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def get_value(self, slot: int) -> int:
        bit = slot * 6
        i, sh = bit >> 3, bit & 7
        two = int(self.packed[i]) | (int(self.packed[i + 1]) << 8)
        return (two >> sh) & 0x3F

    def _put_value(self, slot: int, value: int) -> None:
        bit = slot * 6
        i, sh = bit >> 3, bit & 7
        two = int(self.packed[i]) | (int(self.packed[i + 1]) << 8)
        two = (two & ~(0x3F << sh)) | ((value & 0x3F) << sh)
        self.packed[i] = two & 0xFF
        self.packed[i + 1] = two >> 8

    def _hip_update(self, old: int, new: int) -> None:
        if not self.out_of_order:
            self.hip_accum += self.k / (self.kxq0 + self.kxq1)
        for v, sign in ((old, -1.0), (new, 1.0)):
            w = sign * (1.0 if v == 0 else 2.0 ** (-float(v)))
            if v < 32:
                self.kxq0 += w
            else:
                self.kxq1 += w

    def update_coupons(self, coupons: np.ndarray) -> "Hll6Array":
        """Vectorized screen + scalar per-raise loop (register raises are
        O(k log n) over a sketch's lifetime, so the loop is bounded)."""
        slots, values = coupon_slot_value(np.asarray(coupons), self.lg_k)
        cur = self.registers()
        cand = np.nonzero(values > cur[slots])[0]
        for s, v in zip(slots[cand].tolist(), values[cand].tolist()):
            old = self.get_value(s)
            if v <= old:                 # duplicate slot within the batch
                continue
            self._hip_update(old, v)
            self._put_value(s, v)
        return self

    def registers(self) -> np.ndarray:
        """Expand to flat uint8 values (the dense representation)."""
        k = self.k
        bits = np.unpackbits(self.packed, bitorder="little")[: 6 * k]
        weights = (np.uint8(1) << np.arange(6, dtype=np.uint8))
        return (bits.reshape(k, 6) * weights).sum(axis=1).astype(np.uint8)

    @classmethod
    def from_registers(cls, lg_k: int, regs: np.ndarray,
                       **state) -> "Hll6Array":
        k = 1 << lg_k
        bits = ((regs.astype(np.uint8)[:, None]
                 >> np.arange(6, dtype=np.uint8)) & 1).ravel()
        packed = np.packbits(bits, bitorder="little")
        full = np.zeros(((k * 3) >> 2) + 1, dtype=np.uint8)
        full[:packed.size] = packed
        return cls(lg_k=lg_k, packed=full, **state)

    def to_hll8(self) -> HllSketch:
        return HllSketch(lg_k=self.lg_k, seed=self.seed,
                         regs=self.registers(), hip_accum=self.hip_accum,
                         kxq0=self.kxq0, kxq1=self.kxq1,
                         out_of_order=self.out_of_order)

    def estimate(self) -> float:
        return self.to_hll8().estimate()

    def bounds(self, num_std_dev: int = 2) -> tuple[float, float]:
        return self.to_hll8().bounds(num_std_dev)

    # -- reference wire format (array6.rs:270-300) ---------------------------

    def serialize(self) -> bytes:
        out = bytearray()
        flags = 16 if self.out_of_order else 0     # OUT_OF_ORDER mask
        mode_byte = 2 | (1 << 2)                   # CUR_MODE_HLL, TGT_HLL6
        out += struct.pack("<BBBBBBBB", 10, 1, 7, self.lg_k, 0, flags,
                           0, mode_byte)
        out += struct.pack("<ddd", self.hip_accum, self.kxq0, self.kxq1)
        num_zeros = int(np.count_nonzero(self.registers() == 0))
        out += struct.pack("<II", num_zeros, 0)
        out += self.packed.tobytes()
        return bytes(out)


# ---------------------------------------------------------------------------
# The mode ladder
# ---------------------------------------------------------------------------

@dataclass
class HllLadder:
    """List -> Set -> Array mode machine (hll/sketch.rs:209-238).

    ``tgt`` picks the array-mode register packing: 'hll8' (dense
    HllSketch), 'hll6' (Hll6Array) or 'hll4' (Hll4Array). Coupon stages
    are identical for all three."""

    lg_k: int
    seed: int = DEFAULT_SEED
    tgt: str = "hll8"
    mode: str = "list"
    coupons: set = field(default_factory=set)
    lg_cur_size: int = LG_INIT_LIST_SIZE
    array: object = None                # HllSketch | Hll4Array in array mode

    def __post_init__(self) -> None:
        if not (4 <= self.lg_k <= 21):
            raise ValueError(f"lg_k {self.lg_k} out of [4, 21]")
        if self.tgt not in ("hll4", "hll6", "hll8"):
            raise ValueError(f"tgt must be hll4|hll6|hll8, got {self.tgt}")

    @property
    def num_coupons(self) -> int:
        return len(self.coupons)

    def update_keys(self, data: np.ndarray) -> "HllLadder":
        return self.update_coupons(coupons_from_keys26(data, self.seed))

    def update_coupons(self, coupons: np.ndarray) -> "HllLadder":
        if self.mode == "array":
            self._array_update(coupons)
            return self
        # dedup but PRESERVE arrival order: np.unique's value-sort would
        # drain the post-promotion remainder in ascending register-value
        # order, inflating the raise count and biasing HIP upward ~1.6x
        # (the reference streams items in arrival order, sketch.rs:209-238)
        arr = np.asarray(coupons, dtype=np.uint32)
        _, first_idx = np.unique(arr, return_index=True)
        uniq = arr[np.sort(first_idx)]
        for i, c in enumerate(uniq.tolist()):
            self.coupons.add(c)
            self._maybe_promote()
            if self.mode == "array":
                # promotion fired mid-batch: drain the rest in bulk
                self._array_update(uniq[i + 1:])
                break
        return self

    def _array_update(self, coupons: np.ndarray) -> None:
        if isinstance(self.array, (Hll4Array, Hll6Array)):
            self.array.update_coupons(coupons)
        else:
            self.array.update_coupons(
                *coupon_slot_value(np.asarray(coupons), self.lg_k))

    def _maybe_promote(self) -> None:
        n, cap = len(self.coupons), 1 << self.lg_cur_size
        if self.mode == "list":
            if n == cap:                           # list.rs is_full
                if self.lg_k < 8:                  # sketch.rs:215-219
                    self._promote_to_array()
                else:
                    self.mode = "set"
                    self.lg_cur_size = LG_INIT_SET_SIZE
        elif self.mode == "set":
            if RESIZE_DEN * n > RESIZE_NUM * cap:  # sketch.rs:224-232
                if self.lg_cur_size == self.lg_k - 3:
                    self._promote_to_array()
                else:
                    self.lg_cur_size += 1          # grow_set

    def _promote_to_array(self) -> None:
        arr = {"hll4": Hll4Array, "hll6": Hll6Array,
               "hll8": HllSketch}[self.tgt](self.lg_k, self.seed)
        cs = np.fromiter(self.coupons, dtype=np.uint32,
                         count=len(self.coupons))
        if isinstance(arr, HllSketch):
            arr.update_coupons(*coupon_slot_value(cs, self.lg_k))
        else:
            arr.update_coupons(cs)
        # HIP accumulator seeded with the coupon estimate
        # (sketch.rs:450-476 set_hip_accum(container.estimate()))
        arr.hip_accum = coupon_estimate(len(self.coupons))
        self.array = arr
        self.mode = "array"
        self.coupons = set()

    def estimate(self) -> float:
        if self.mode == "array":
            return self.array.estimate()
        return coupon_estimate(self.num_coupons)

    def bounds(self, num_std_dev: int = 2) -> tuple[float, float]:
        if self.mode == "array":
            return self.array.bounds(num_std_dev)
        return coupon_bounds(self.num_coupons, num_std_dev)

    def to_dense(self) -> HllSketch:
        """Dense HllSketch view (promotes a copy; self is unchanged)."""
        if self.mode == "array":
            arr = self.array
            return (arr.to_hll8()
                    if isinstance(arr, (Hll4Array, Hll6Array)) else arr)
        sk = HllSketch(self.lg_k, self.seed)
        if self.coupons:
            cs = np.fromiter(self.coupons, dtype=np.uint32,
                             count=len(self.coupons))
            sk.update_coupons(*coupon_slot_value(cs, self.lg_k))
            sk.hip_accum = coupon_estimate(len(self.coupons))
        return sk

    def union(self, other: "HllLadder") -> "HllLadder":
        """Sparse∪sparse stays sparse (coupon set union + re-run of the
        promotion ladder); anything denser delegates to the dense union
        (union.rs:18-62 case analysis collapses to these two)."""
        if self.seed != other.seed:
            raise serde.SketchDecodeError("seed mismatch in HLL union")
        if self.mode != "array" and other.mode != "array" \
                and self.lg_k == other.lg_k:
            out = HllLadder(self.lg_k, self.seed, self.tgt)
            out.mode = ("set" if "set" in (self.mode, other.mode)
                        else "list")
            out.lg_cur_size = max(self.lg_cur_size, other.lg_cur_size)
            merged = np.fromiter(self.coupons | other.coupons,
                                 dtype=np.uint32)
            out.update_coupons(merged)
            return out
        dense = self.to_dense().union(other.to_dense())
        out = HllLadder(dense.lg_k, self.seed, self.tgt, mode="array")
        out.array = dense
        return out

    # -- serde ---------------------------------------------------------------
    # Sparse stages serialize to the reference LIST/SET compact layouts
    # (list.rs:serialize, hash_set.rs:serialize); array stages to HLL4 /
    # HLL8 — every branch readable by compat.decode_hll.

    def serialize(self) -> bytes:
        if self.mode == "array":
            if isinstance(self.array, Hll4Array):
                return self.array.serialize()
            from datasketches_rust_spark.sketches.compat import encode_hll8
            return encode_hll8(self.array)
        n = len(self.coupons)
        cs = sorted(self.coupons)
        out = bytearray()
        if self.mode == "list":
            flags = 8 | (4 if n == 0 else 0)       # COMPACT (+EMPTY)
            out += struct.pack("<BBBBBBBB", 2, 1, 7, self.lg_k,
                               self.lg_cur_size, flags, n, 0)
        else:
            flags = 8
            out += struct.pack("<BBBBBBBB", 3, 1, 7, self.lg_k,
                               self.lg_cur_size, flags, 0, 1)
            out += struct.pack("<I", n)
        for c in cs:
            out += struct.pack("<I", c)
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = DEFAULT_SEED,
                    tgt: str = "hll8") -> "HllLadder":
        """Rebuild a ladder from any reference-layout HLL payload. Coupon
        stages restore the exact sparse state; array stages wrap the
        compat-decoded dense sketch."""
        if len(buf) < 8:
            raise serde.SketchDecodeError("hll preamble truncated")
        preints, _, family, lg_k, lg_arr, flags, state, mode_byte = buf[:8]
        if family != 7:
            raise serde.SketchDecodeError(f"family {family} is not HLL")
        cur_mode = mode_byte & 0x3
        if cur_mode == 2:                            # array mode
            from datasketches_rust_spark.sketches.compat import decode_hll
            out = cls(lg_k, seed, tgt, mode="array")
            out.array = decode_hll(buf, seed)
            return out
        out = cls(lg_k, seed, tgt)
        out.mode = "list" if cur_mode == 0 else "set"
        out.lg_cur_size = lg_arr
        if cur_mode == 0:
            n, off = (0 if flags & 4 else state), 8
        else:
            if len(buf) < 12:
                raise serde.SketchDecodeError("set coupon count truncated")
            (n,), off = struct.unpack_from("<I", buf, 8), 12
        if len(buf) < off + 4 * n:
            raise serde.SketchDecodeError("coupon list truncated")
        cs = np.frombuffer(buf, dtype="<u4", count=n, offset=off)
        out.coupons = set(int(c) for c in cs if c != 0)
        return out
