"""Golden-file bit-exactness suite: the reference's committed test
binaries (tests/test_data/*.sk) decoded by our compat decoders and held
to the reference's own assertions
(tests/tdigest_serialization_test.rs:76-110).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from datasketches_rust_spark.sketches.compat import decode_tdigest
from datasketches_rust_spark.sketches.serde import SketchDecodeError
from datasketches_rust_spark.sketches.tdigest import TDigest

GOLDEN_DIR = "/root/reference/datasketches/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference golden corpus absent")


@pytest.mark.parametrize("name", ["tdigest_ref_k100_n10000_double.sk",
                                  "tdigest_ref_k100_n10000_float.sk"])
def test_reference_implementation_golden(name):
    """Byte-identical mirror of
    tdigest_serialization_test.rs:test_deserialize_from_reference_implementation."""
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        td = decode_tdigest(f.read())
    n = 10000
    assert td.k == 100
    assert td.total_weight() == n
    assert td.min_val == 0.0
    assert td.max_val == float(n - 1)
    assert td.rank(0.0) == pytest.approx(0.0, abs=1e-4)
    assert td.rank(n / 4.0) == pytest.approx(0.25, abs=1e-4)
    assert td.rank(n / 2.0) == pytest.approx(0.5, abs=1e-4)
    assert td.rank(n * 3 / 4.0) == pytest.approx(0.75, abs=1e-4)
    assert td.rank(float(n)) == 1.0


def test_golden_survives_our_roundtrip():
    """A decoded golden sketch must survive OUR serde unchanged — the
    bridge between the reference corpus and in-engine shuffle state."""
    with open(os.path.join(GOLDEN_DIR,
                           "tdigest_ref_k100_n10000_double.sk"), "rb") as f:
        td = decode_tdigest(f.read())
    rt = TDigest.deserialize(td.serialize())
    assert rt.total_weight() == td.total_weight()
    assert rt.rank(5000.0) == td.rank(5000.0)
    assert rt.quantile(0.5) == td.quantile(0.5)


def test_golden_merges_with_native():
    """Merging a golden-decoded digest with a natively built one keeps
    rank accuracy (the cross-implementation interop the reference's
    corpus exists to protect)."""
    with open(os.path.join(GOLDEN_DIR,
                           "tdigest_ref_k100_n10000_double.sk"), "rb") as f:
        golden = decode_tdigest(f.read())
    native = TDigest(k=100)
    native.update_values(np.arange(10000, 20000, dtype=np.float64))
    merged = golden.merge(native)
    assert merged.total_weight() == 20000
    assert merged.rank(10000.0) == pytest.approx(0.5, abs=0.01)


def _ds_v1_blob(k: int, means, weights, mn, mx, buffered=()):
    """Synthesize a DataSketches t-digest v1 (LE, double) blob per
    tdigest/sketch.rs:431-???/serialization.rs constants — exercises the
    non-compat decoder branch without needing external files."""
    head = struct.pack("<BBBHBH", 2, 1, 20, k, 4, 0)  # REVERSE flag set
    body = struct.pack("<II", len(means), len(buffered))
    body += struct.pack("<dd", mn, mx)
    for m, w in zip(means, weights):
        body += struct.pack("<dQ", m, w)
    for v in buffered:
        body += struct.pack("<d", v)
    return head + body


class TestDataSketchesV1Format:
    def test_multi_centroid(self):
        td = decode_tdigest(_ds_v1_blob(
            100, [1.0, 5.0, 9.0], [2, 6, 2], 0.5, 9.5, buffered=[4.0]))
        assert td.k == 100
        assert td.total_weight() == 11
        assert td.min_val == 0.5 and td.max_val == 9.5

    def test_empty(self):
        blob = struct.pack("<BBBHBH", 1, 1, 20, 100, 1, 0)  # EMPTY flag
        td = decode_tdigest(blob)
        assert td.total_weight() == 0

    def test_single_value(self):
        blob = struct.pack("<BBBHBH", 1, 1, 20, 100, 2, 0)  # SINGLE flag
        blob += struct.pack("<d", 42.0)
        td = decode_tdigest(blob)
        assert td.total_weight() == 1
        assert td.quantile(0.5) == 42.0

    def test_corruption_rejected(self):
        with pytest.raises(SketchDecodeError):
            decode_tdigest(b"\x02\x01\x13junk")  # wrong family id
        with pytest.raises(SketchDecodeError):
            decode_tdigest(_ds_v1_blob(100, [1.0], [1], 0, 1)[:-4])
        with pytest.raises(SketchDecodeError):
            decode_tdigest(_ds_v1_blob(100, [1.0], [0], 0, 1))  # 0 weight
        with pytest.raises(SketchDecodeError):
            decode_tdigest(struct.pack(">I", 99))  # unknown compat type


# ---------------------------------------------------------------------------
# Compact theta wire formats v1-v4 (theta/sketch.rs:598-891). No committed
# theta golden binaries exist in-sandbox (tests/serialization_test_data is
# generator-produced and absent), so the fixtures below are hand-assembled
# bytes following the published layout — independent of our writer — plus
# writer/reader round-trips and the reference's corruption rejections.

from datasketches_rust_spark.hashing import compute_seed_hash, hash_u64s
from datasketches_rust_spark.sketches.compat import (decode_theta,
                                                     encode_theta_v3,
                                                     encode_theta_v4)
from datasketches_rust_spark.sketches.theta import MAX_THETA, ThetaSketch

_SEED_HASH = compute_seed_hash(9001)


class TestThetaWire:
    def _v3_exact_blob(self, entries):
        # pre_longs=2, ser=3, family=3, unused u16, flags(RO|COMPACT|ORD),
        # seed_hash, num_entries u32, unused u32, entries u64 LE
        blob = struct.pack("<BBB", 2, 3, 3) + b"\x00\x00"
        blob += struct.pack("<BH", 0b11010, _SEED_HASH)
        blob += struct.pack("<I", len(entries)) + b"\x00" * 4
        for e in entries:
            blob += struct.pack("<Q", e)
        return blob

    def test_v3_exact_hand_assembled(self):
        entries = [100, 2000, 30000, 400000]
        d = decode_theta(self._v3_exact_blob(entries))
        assert list(d.entries) == entries
        assert d.theta == int(MAX_THETA) and not d.empty and d.ordered
        assert d.estimate() == 4.0

    def test_v3_estimation_hand_assembled(self):
        theta = int(MAX_THETA) // 2
        entries = [7, 11, 13]
        blob = struct.pack("<BBB", 3, 3, 3) + b"\x00\x00"
        blob += struct.pack("<BH", 0b11010, _SEED_HASH)
        blob += struct.pack("<I", len(entries)) + b"\x00" * 4
        blob += struct.pack("<Q", theta)
        for e in entries:
            blob += struct.pack("<Q", e)
        d = decode_theta(blob)
        assert d.theta == theta
        assert d.estimate() == pytest.approx(6.0, rel=1e-9)

    def test_v3_single_prelong1(self):
        # pre_longs=1 implies exactly one entry (theta/sketch.rs:779-781)
        blob = struct.pack("<BBB", 1, 3, 3) + b"\x00\x00"
        blob += struct.pack("<BH", 0b11010, _SEED_HASH)
        blob += struct.pack("<Q", 424242)
        d = decode_theta(blob)
        assert list(d.entries) == [424242] and d.estimate() == 1.0

    def test_v3_empty_flag(self):
        blob = struct.pack("<BBB", 1, 3, 3) + b"\x00\x00"
        blob += struct.pack("<BH", 0b11110, 0)  # EMPTY: seed hash unchecked
        d = decode_theta(blob)
        assert d.empty and d.estimate() == 0.0

    def test_v1_v2_hand_assembled(self):
        # v1: pre, ser=1, fam, unused u8, unused u32... layout from
        # theta/sketch.rs:648-685
        entries = [5, 17]
        v1 = struct.pack("<BBBB", 3, 1, 3, 0) + struct.pack("<I", 0)
        v1 += struct.pack("<II", len(entries), 0)
        v1 += struct.pack("<Q", int(MAX_THETA))
        for e in entries:
            v1 += struct.pack("<Q", e)
        d = decode_theta(v1)
        assert list(d.entries) == entries and not d.is_estimation_mode()
        # v2 estimate-mode: pre_longs=3 (theta/sketch.rs:730-750)
        theta = int(MAX_THETA) // 4
        v2 = struct.pack("<BBBB", 3, 2, 3, 0)
        v2 += struct.pack("<HH", 0, _SEED_HASH)
        v2 += struct.pack("<II", 1, 0) + struct.pack("<Q", theta)
        v2 += struct.pack("<Q", 99)
        d2 = decode_theta(v2)
        assert list(d2.entries) == [99] and d2.theta == theta

    def test_v4_hand_assembled(self):
        # entries 1,2,3 -> deltas 1,1,1 -> entry_bits=1, MSB-first stream
        # 0b111 padded -> byte 0xE0 (theta/sketch.rs:807-891, bit_pack.rs)
        blob = struct.pack("<BBBBBB", 1, 4, 3, 1, 1, 0b11010)
        blob += struct.pack("<H", _SEED_HASH)
        blob += bytes([3])          # num_entries = 3 (1 byte)
        blob += bytes([0b11100000])
        d = decode_theta(blob)
        assert list(d.entries) == [1, 2, 3]
        assert d.estimate() == 3.0

    def test_round_trip_all_modes(self):
        import numpy as np
        sk = ThetaSketch(lg_k=8)
        sk.update_hashes(hash_u64s(np.arange(10000, dtype=np.uint64)))
        assert sk.is_estimation_mode()
        for enc in (encode_theta_v3, encode_theta_v4):
            d = decode_theta(enc(sk))
            assert np.array_equal(d.entries, sk.entries)
            assert d.theta == int(sk.theta)
            nat = d.to_native(lg_k=8)
            assert nat.estimate() == pytest.approx(sk.estimate())
        small = ThetaSketch(lg_k=12)
        small.update_hashes(hash_u64s(np.arange(7, dtype=np.uint64)))
        for enc in (encode_theta_v3, encode_theta_v4):
            assert decode_theta(enc(small)).estimate() == 7.0
        assert decode_theta(encode_theta_v3(ThetaSketch(lg_k=12))).empty

    def test_v4_matches_v3_content(self):
        import numpy as np
        sk = ThetaSketch(lg_k=6)
        sk.update_hashes(hash_u64s(np.arange(300, dtype=np.uint64)))
        a, b = decode_theta(encode_theta_v3(sk)), \
            decode_theta(encode_theta_v4(sk))
        assert np.array_equal(a.entries, b.entries) and a.theta == b.theta
        assert len(encode_theta_v4(sk)) < len(encode_theta_v3(sk))

    def test_corruptions_rejected(self):
        good = self._v3_exact_blob([100, 200])
        with pytest.raises(SketchDecodeError):
            decode_theta(good[:-4])                       # truncated
        with pytest.raises(SketchDecodeError):
            decode_theta(good[:2] + b"\x14" + good[3:])   # wrong family
        bad_seed = good[:6] + struct.pack("<H", _SEED_HASH ^ 1) + good[8:]
        with pytest.raises(SketchDecodeError):
            decode_theta(bad_seed)
        with pytest.raises(SketchDecodeError):            # hash 0 invalid
            decode_theta(self._v3_exact_blob([0, 200]))
        with pytest.raises(SketchDecodeError):            # bad serial ver
            decode_theta(good[:1] + b"\x07" + good[2:])


# ---------------------------------------------------------------------------
# HLL reference wire format (hll/serialization.rs, array{4,6,8}/list/set
# layouts). Hand-assembled fixtures per the published layout + round-trips.

import numpy as np

from datasketches_rust_spark.sketches.compat import decode_hll, encode_hll8
from datasketches_rust_spark.sketches.hll import HllSketch


class TestHllWire:
    def _keys(self, n):
        raw = b"".join(f"user{i:06d}".encode().ljust(12) for i in range(n))
        return np.frombuffer(raw, dtype=np.uint8).reshape(n, 12)

    def test_hll8_round_trip_preserves_hip(self):
        sk = HllSketch(lg_k=11)
        sk.update_keys(self._keys(50000))
        d = decode_hll(encode_hll8(sk))
        assert np.array_equal(d.regs, sk.regs)
        assert d.hip_accum == sk.hip_accum and d.kxq0 == sk.kxq0
        assert d.estimate() == pytest.approx(sk.estimate())
        # HIP RSE at lg_k=11 is 0.8326/sqrt(2048) = 1.85%; allow ~2 sigma
        # (the reference's <2% golden band, hll_serialization_test.rs:225,
        # is at lg_k 14 where the RSE is 3x tighter)
        assert d.estimate() == pytest.approx(50000, rel=0.04)

    def test_list_mode_hand_assembled(self):
        slots = np.array([5, 99, 1000])
        vals = np.array([3, 7, 12], dtype=np.uint8)
        want = HllSketch(lg_k=10)
        want.update_coupons(slots, vals)
        coupons = [(int(v) << 26) | int(s) for s, v in zip(slots, vals)]
        blob = struct.pack("<BBBBBBBB", 2, 1, 7, 10, 3, 8, 3, 0 | (2 << 2))
        blob += b"".join(struct.pack("<I", c) for c in coupons)
        d = decode_hll(blob)
        assert np.array_equal(d.regs, want.regs)
        assert d.estimate() == pytest.approx(want.estimate())

    def test_set_mode_non_compact_with_empties(self):
        coupons = [(7 << 26) | 42, 0, (9 << 26) | 99, 0]  # EMPTY sentinels
        blob = struct.pack("<BBBBBBBB", 3, 1, 7, 8, 2, 0, 0, 1 | (2 << 2))
        blob += struct.pack("<I", 2)
        blob += b"".join(struct.pack("<I", c) for c in coupons)
        d = decode_hll(blob)
        assert d.regs[42] == 7 and d.regs[99] == 9
        assert np.count_nonzero(d.regs) == 2

    def test_hll6_hand_packed(self):
        rng = np.random.default_rng(5)
        regs = rng.integers(0, 50, 16, dtype=np.uint8)
        bits = np.unpackbits(regs[:, None] & np.uint8(0x3F), axis=1,
                             bitorder="little")[:, :6].ravel()
        data = np.packbits(bits, bitorder="little").tobytes() + b"\x00" * 3
        blob = struct.pack("<BBBBBBBB", 10, 1, 7, 4, 0, 0, 0, 2 | (1 << 2))
        blob += struct.pack("<ddd", 12.5, 3.0, 1.0)
        blob += struct.pack("<II", 0, 0) + data
        d = decode_hll(blob)
        assert np.array_equal(d.regs, regs) and d.hip_accum == 12.5

    def test_hll4_with_aux_map(self):
        regs = np.array([2, 3, 17, 4] * 4, dtype=np.uint8)
        cur_min = 2
        raw = np.minimum(regs - cur_min, 15).astype(np.uint8)
        nib = (raw[0::2] | (raw[1::2] << 4)).astype(np.uint8)
        aux = [(int(regs[i]) << 26) | i for i in range(16) if raw[i] == 15]
        blob = struct.pack("<BBBBBBBB", 10, 1, 7, 4, 0, 0, cur_min, 2)
        blob += struct.pack("<ddd", 0.0, 1.0, 0.0)
        blob += struct.pack("<II", 0, len(aux))
        blob += nib.tobytes() + b"".join(struct.pack("<I", c) for c in aux)
        d = decode_hll(blob)
        assert np.array_equal(d.regs, regs)

    def test_corruptions_rejected(self):
        good = encode_hll8(HllSketch(lg_k=4))
        with pytest.raises(SketchDecodeError):
            decode_hll(good[:20])                          # truncated
        with pytest.raises(SketchDecodeError):
            decode_hll(good[:2] + b"\x03" + good[3:])      # wrong family
        with pytest.raises(SketchDecodeError):
            decode_hll(good[:3] + b"\x16" + good[4:])      # lg_k 22
        with pytest.raises(SketchDecodeError):
            decode_hll(good[:1] + b"\x02" + good[2:])      # bad serial


def test_encode_tdigest_roundtrip_native():
    """Native digest -> reference wire bytes -> decode: identical
    centroids, bounds and quantiles."""
    import numpy as np
    from datasketches_rust_spark.sketches.compat import (decode_tdigest,
                                                         encode_tdigest)
    from datasketches_rust_spark.sketches.tdigest import TDigest
    rng = np.random.default_rng(7)
    td = TDigest(k=100).update_values(rng.standard_normal(50_000))
    back = decode_tdigest(encode_tdigest(td))
    td._compress()
    np.testing.assert_allclose(back.means, td.means)
    np.testing.assert_allclose(back.weights, td.weights)
    assert back.min_val == td.min_val and back.max_val == td.max_val
    for q in (0.0, 0.01, 0.5, 0.99, 1.0):
        assert back.quantile(q) == pytest.approx(td.quantile(q))


def test_encode_tdigest_empty_and_single():
    from datasketches_rust_spark.sketches.compat import (decode_tdigest,
                                                         encode_tdigest)
    from datasketches_rust_spark.sketches.tdigest import TDigest
    import numpy as np
    empty = decode_tdigest(encode_tdigest(TDigest(k=100)))
    assert empty.means.size == 0 and empty._buffer == []
    single = decode_tdigest(encode_tdigest(
        TDigest(k=100).update_values(np.array([3.25]))))
    assert single.quantile(0.5) == 3.25


@pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference golden corpus absent")
def test_encode_tdigest_roundtrips_reference_golden():
    """Reference-committed golden bytes -> our decode -> our encode ->
    decode: the reference corpus survives a write round-trip."""
    import glob as _glob
    import numpy as np
    from datasketches_rust_spark.sketches.compat import (decode_tdigest,
                                                         encode_tdigest)
    files = sorted(_glob.glob(os.path.join(GOLDEN_DIR, "*double*.sk")))
    assert files
    for f in files:
        with open(f, "rb") as fh:
            golden = decode_tdigest(fh.read())
        back = decode_tdigest(encode_tdigest(golden))
        golden._compress()
        np.testing.assert_allclose(back.means, golden.means)
        np.testing.assert_allclose(back.weights, golden.weights)
