"""HLL representation ladder (List -> Set -> Array) + HLL4 aux map.

Mirrors the reference mode machine (hll/sketch.rs:209-238) and the
Array4 exception handling (hll/array4.rs) — pure numpy, no Spark.
"""

import numpy as np
import pytest

from datasketches_rust_spark.hashing import hash_u64s
from datasketches_rust_spark.sketches.compat import decode_hll
from datasketches_rust_spark.sketches.hll import HllSketch
from datasketches_rust_spark.sketches.hll_ladder import (
    AUX_TOKEN, Hll4Array, Hll6Array, HllLadder, coupon_bounds,
    coupon_estimate, coupon_slot_value, coupons_from_keys26)


def _keys(n, start=0):
    return hash_u64s(np.arange(start, start + n,
                               dtype=np.uint64)).reshape(-1, 1).view(np.uint8)


def _dense(lg_k, keys):
    return HllSketch(lg_k=lg_k).update_keys(keys)


class TestCouponEstimate:
    def test_identity_at_tiny_n(self):
        assert coupon_estimate(0) == 0.0
        assert coupon_estimate(1) == pytest.approx(1.0)
        # grid point 20 maps to ~20.0000009 (coupon_mapping.rs row 2)
        assert coupon_estimate(20) == pytest.approx(20.0, rel=1e-6)

    def test_monotone_and_above_count(self):
        prev = 0.0
        for n in (1, 5, 50, 500, 5000, 100_000, 2_000_000):
            est = coupon_estimate(n)
            assert est >= n          # container.rs:111 len.max(est)
            assert est >= prev
            prev = est

    def test_bounds_bracket(self):
        for n in (3, 40, 4000):
            lb, ub = coupon_bounds(n)
            assert lb <= coupon_estimate(n) <= ub
            assert lb >= n           # count is a hard lower bound

    def test_bad_num_std_dev(self):
        with pytest.raises(ValueError):
            coupon_bounds(10, 4)


class TestLadderModes:
    def test_list_to_set_to_array(self):
        lad = HllLadder(lg_k=10)
        assert lad.mode == "list"
        lad.update_keys(_keys(7))
        assert lad.mode == "list" and lad.num_coupons == 7
        lad.update_keys(_keys(1, start=100))    # 8th coupon fills the list
        assert lad.mode == "set"                # lg_k >= 8 -> SET
        assert lad.lg_cur_size == 5
        # set promotes to array only at lg_cur_size == lg_k - 3 (=7)
        # and 75% load => 3/4 * 128 = 96 coupons
        lad.update_keys(_keys(200))
        assert lad.mode == "array"
        assert isinstance(lad.array, HllSketch)

    def test_small_lg_k_skips_set(self):
        lad = HllLadder(lg_k=6)                 # lg_k < 8: list -> array
        lad.update_keys(_keys(8))
        assert lad.mode == "array"

    def test_set_growth_steps(self):
        lad = HllLadder(lg_k=14)
        lad.update_keys(_keys(8))
        assert lad.mode == "set" and lad.lg_cur_size == 5
        lad.update_keys(_keys(30))              # >24 = 3/4 * 32 -> grow
        assert lad.mode == "set" and lad.lg_cur_size > 5

    def test_sparse_estimate_is_near_exact(self):
        lad = HllLadder(lg_k=14)
        lad.update_keys(_keys(60))
        assert lad.mode != "array"
        assert lad.estimate() == pytest.approx(60, rel=0.01)
        lb, ub = lad.bounds()
        assert lb <= 60 <= ub * 1.001

    def test_array_estimate_matches_dense_tolerance(self):
        n = 40_000
        lad = HllLadder(lg_k=12).update_keys(_keys(n))
        assert lad.mode == "array"
        assert lad.estimate() == pytest.approx(n, rel=0.05)

    def test_duplicates_do_not_advance_modes(self):
        lad = HllLadder(lg_k=10)
        k = _keys(5)
        for _ in range(10):
            lad.update_keys(k)
        assert lad.mode == "list" and lad.num_coupons == 5


class TestLadderUnion:
    def test_sparse_union_stays_sparse(self):
        a = HllLadder(lg_k=12).update_keys(_keys(10))
        b = HllLadder(lg_k=12).update_keys(_keys(10, start=5))
        u = a.union(b)
        assert u.mode != "array"
        assert u.num_coupons == len(
            set(map(int, coupons_from_keys26(_keys(15)))))
        assert u.estimate() == pytest.approx(15, rel=0.01)

    def test_mixed_union_goes_dense(self):
        a = HllLadder(lg_k=11).update_keys(_keys(500))
        assert a.mode == "array"
        b = HllLadder(lg_k=11).update_keys(_keys(10, start=1000))
        u = a.union(b)
        assert u.mode == "array"
        assert u.estimate() == pytest.approx(510, rel=0.06)

    def test_union_seed_mismatch(self):
        from datasketches_rust_spark.sketches.serde import SketchDecodeError
        with pytest.raises(SketchDecodeError):
            HllLadder(lg_k=10).union(HllLadder(lg_k=10, seed=1))


class TestHll4Array:
    def test_matches_dense_exactly(self):
        """Same coupons, same order -> identical registers AND identical
        HIP estimator state (the 4-bit packing is lossless via aux)."""
        keys = _keys(20_000)
        cs = coupons_from_keys26(keys)
        a4 = Hll4Array(lg_k=7).update_coupons(cs)
        dense = HllSketch(lg_k=7)
        dense.update_coupons(*coupon_slot_value(cs, 7))
        np.testing.assert_array_equal(a4.registers(), dense.regs)
        assert a4.hip_accum == pytest.approx(dense.hip_accum, rel=1e-12)
        assert a4.kxq0 == pytest.approx(dense.kxq0, rel=1e-12)
        assert a4.kxq1 == pytest.approx(dense.kxq1, rel=1e-12)
        assert a4.estimate() == pytest.approx(dense.estimate(), rel=1e-12)

    def test_cur_min_shifts_at_small_k(self):
        """lg_k=4 with many updates drives every slot above 0, forcing
        the cur_min offset machinery (array4.rs:207-250)."""
        cs = coupons_from_keys26(_keys(300_000))
        a4 = Hll4Array(lg_k=4).update_coupons(cs)
        assert a4.cur_min > 0
        dense = HllSketch(lg_k=4)
        dense.update_coupons(*coupon_slot_value(cs, 4))
        np.testing.assert_array_equal(a4.registers(), dense.regs)
        assert int(a4.registers().min()) >= a4.cur_min

    def test_aux_map_exceptions(self):
        """A register > cur_min + 14 must live in the aux map with
        AUX_TOKEN in the nibble."""
        a4 = Hll4Array(lg_k=4)
        # craft a coupon with slot 3, value 40 (>> 15-cap window)
        c = np.array([(40 << 26) | 3], dtype=np.uint32)
        a4.update_coupons(c)
        assert a4.aux == {3: 40}
        assert a4._get_raw(3) == AUX_TOKEN
        assert a4.get_value(3) == 40
        assert a4.registers()[3] == 40
        # raising the exception replaces in aux
        a4.update_coupons(np.array([(50 << 26) | 3], dtype=np.uint32))
        assert a4.aux == {3: 50}
        # a lower value is a no-op
        a4.update_coupons(np.array([(45 << 26) | 3], dtype=np.uint32))
        assert a4.aux == {3: 50}

    def test_serialize_roundtrip_via_compat(self):
        cs = coupons_from_keys26(_keys(50_000))
        a4 = Hll4Array(lg_k=6).update_coupons(cs)
        assert a4.aux or a4.cur_min >= 0     # payload exercised either way
        back = decode_hll(a4.serialize())
        np.testing.assert_array_equal(back.regs, a4.registers())
        assert back.hip_accum == pytest.approx(a4.hip_accum)
        assert back.estimate() == pytest.approx(a4.estimate(), rel=1e-9)


class TestHll6Array:
    def test_matches_dense_exactly(self):
        """Same coupons, same order -> identical registers AND identical
        HIP estimator state (6 bits hold the max register value 62, so
        the packing is lossless with no offset/aux machinery)."""
        keys = _keys(20_000)
        cs = coupons_from_keys26(keys)
        a6 = Hll6Array(lg_k=7).update_coupons(cs)
        dense = HllSketch(lg_k=7)
        dense.update_coupons(*coupon_slot_value(cs, 7))
        np.testing.assert_array_equal(a6.registers(), dense.regs)
        assert a6.hip_accum == pytest.approx(dense.hip_accum, rel=1e-12)
        assert a6.kxq0 == pytest.approx(dense.kxq0, rel=1e-12)
        assert a6.kxq1 == pytest.approx(dense.kxq1, rel=1e-12)
        assert a6.estimate() == pytest.approx(dense.estimate(), rel=1e-12)

    def test_packing_is_three_quarters_of_dense(self):
        a6 = Hll6Array(lg_k=12)
        assert a6.packed.nbytes == ((1 << 12) * 3 // 4) + 1

    def test_get_put_cross_byte_boundaries(self):
        """6-bit fields straddle byte boundaries at every slot % 4 != 0;
        exercise all four alignments including the max value 62."""
        a6 = Hll6Array(lg_k=4)
        for slot, v in [(0, 62), (1, 1), (2, 33), (3, 7), (15, 62)]:
            a6._put_value(slot, v)
        for slot, v in [(0, 62), (1, 1), (2, 33), (3, 7), (15, 62)]:
            assert a6.get_value(slot) == v
        regs = a6.registers()
        assert regs[0] == 62 and regs[2] == 33 and regs[15] == 62

    def test_from_registers_roundtrip(self):
        cs = coupons_from_keys26(_keys(5_000))
        dense = HllSketch(lg_k=8)
        dense.update_coupons(*coupon_slot_value(cs, 8))
        a6 = Hll6Array.from_registers(8, dense.regs)
        np.testing.assert_array_equal(a6.registers(), dense.regs)

    def test_serialize_roundtrip_via_compat(self):
        cs = coupons_from_keys26(_keys(50_000))
        a6 = Hll6Array(lg_k=6).update_coupons(cs)
        back = decode_hll(a6.serialize())
        np.testing.assert_array_equal(back.regs, a6.registers())
        assert back.hip_accum == pytest.approx(a6.hip_accum)
        assert back.estimate() == pytest.approx(a6.estimate(), rel=1e-9)

    def test_ladder_with_hll6_target(self):
        lad = HllLadder(lg_k=7, tgt="hll6").update_keys(_keys(30_000))
        assert lad.mode == "array" and isinstance(lad.array, Hll6Array)
        dense = _dense(7, _keys(30_000))
        np.testing.assert_array_equal(lad.to_dense().regs, dense.regs)


class TestLadderSerde:
    def test_list_mode_roundtrip(self):
        lad = HllLadder(lg_k=12).update_keys(_keys(5))
        back = HllLadder.deserialize(lad.serialize())
        assert back.mode == "list" and back.coupons == lad.coupons
        assert back.estimate() == pytest.approx(lad.estimate())

    def test_set_mode_roundtrip(self):
        lad = HllLadder(lg_k=14).update_keys(_keys(40))
        assert lad.mode == "set"
        back = HllLadder.deserialize(lad.serialize())
        assert back.mode == "set" and back.coupons == lad.coupons

    def test_array_mode_roundtrip_hll8(self):
        lad = HllLadder(lg_k=10).update_keys(_keys(5000))
        back = HllLadder.deserialize(lad.serialize())
        assert back.mode == "array"
        assert back.estimate() == pytest.approx(lad.estimate(), rel=1e-9)

    def test_array_mode_roundtrip_hll4(self):
        lad = HllLadder(lg_k=10, tgt="hll4").update_keys(_keys(5000))
        assert isinstance(lad.array, Hll4Array)
        back = HllLadder.deserialize(lad.serialize())
        assert back.estimate() == pytest.approx(lad.estimate(), rel=1e-9)

    def test_sparse_payload_readable_by_compat(self):
        """The ladder's LIST/SET layouts are the reference's — the
        wire-compat decoder must accept them."""
        lad = HllLadder(lg_k=12).update_keys(_keys(5))
        dense = decode_hll(lad.serialize())
        assert dense.estimate() == pytest.approx(5, rel=0.01)
        lad2 = HllLadder(lg_k=14).update_keys(_keys(40))
        dense2 = decode_hll(lad2.serialize())
        assert dense2.estimate() == pytest.approx(40, rel=0.02)

    def test_empty_roundtrip(self):
        lad = HllLadder(lg_k=9)
        back = HllLadder.deserialize(lad.serialize())
        assert back.mode == "list" and back.num_coupons == 0
        assert back.estimate() == 0.0


class TestPromotionSeedsHip:
    def test_hip_seeded_with_coupon_estimate(self):
        """sketch.rs:450-476: the array HIP accumulator starts at the
        coupon estimate, so the estimate is continuous across the
        promotion boundary."""
        lad = HllLadder(lg_k=10)
        lad.update_keys(_keys(95))
        pre = lad.estimate()
        assert lad.mode == "set"
        assert pre == pytest.approx(95, rel=0.01)
        lad.update_keys(_keys(10, start=2000))
        assert lad.mode == "array"          # 105 coupons > 97 trip point
        post = lad.estimate()
        # continuity: the 105 total distincts estimate smoothly across
        # the boundary because HIP starts at the coupon estimate
        assert post == pytest.approx(105, rel=0.05)
        assert post > pre
