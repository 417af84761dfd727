"""Property-based tests (hypothesis) for the sketch-kernel ALGEBRA — the
invariants the distributed layer relies on: map-side partials merged in
any order/grouping must equal the single-pass sketch, bounds must contain
the truth, serde must round-trip arbitrary reachable states. These mirror
the reference's algebraic contracts (theta/union.rs, hll/union.rs,
countmin/sketch.rs merge, frequencies/sketch.rs:282-295) but quantify
over random inputs instead of fixed vectors.

All kernels are Spark-free numpy, so hypothesis can afford real example
counts without a session.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_rust_spark.hashing import hash_u64s
from datasketches_rust_spark.sketches.bloom import BloomFilter
from datasketches_rust_spark.sketches.countmin import CountMinSketch
from datasketches_rust_spark.sketches.frequencies import FrequentItemsSketch
from datasketches_rust_spark.sketches.hll import HllSketch
from datasketches_rust_spark.sketches import minhash
from datasketches_rust_spark.sketches.tdigest import TDigest
from datasketches_rust_spark.sketches.theta import ThetaSketch

# value pools small enough to collide, big enough to exercise purge/trim
keys = st.lists(st.integers(min_value=0, max_value=5000),
                min_size=0, max_size=400)
two_key_sets = st.tuples(keys, keys)

SETTINGS = settings(max_examples=60, deadline=None)


def _h(vals) -> np.ndarray:
    return hash_u64s(np.asarray(vals, dtype=np.uint64)) if len(vals) \
        else np.empty(0, dtype=np.uint64)


def _kb(vals) -> np.ndarray:
    """values -> (N, 8) uint8 key matrix (the update_keys/insert_keys
    input convention: raw keys, hashed inside the kernel)."""
    return (np.ascontiguousarray(np.asarray(vals, dtype="<u8"))
            .view(np.uint8).reshape(-1, 8))


# -- theta -------------------------------------------------------------------

@SETTINGS
@given(two_key_sets)
def test_theta_exact_mode_algebra_matches_sets(ab):
    """With n << k every sketch is exact: union/intersect/a_not_b must
    equal the true set-algebra cardinalities, entry-for-entry."""
    a_keys, b_keys = ab
    a = ThetaSketch(lg_k=12).update_hashes(_h(a_keys))
    b = ThetaSketch(lg_k=12).update_hashes(_h(b_keys))
    sa, sb = set(map(int, _h(a_keys))), set(map(int, _h(b_keys)))
    assert set(map(int, a.union(b).entries)) == sa | sb
    assert set(map(int, a.intersect(b).entries)) == sa & sb
    assert set(map(int, a.a_not_b(b).entries)) == sa - sb
    assert a.union(b).estimate() == len(sa | sb)


@SETTINGS
@given(two_key_sets)
def test_theta_union_commutes_and_bounds_contain(ab):
    a_keys, b_keys = ab
    # lg_k=5 (k=32) forces estimation mode at modest input sizes
    a = ThetaSketch(lg_k=5).update_hashes(_h(a_keys))
    b = ThetaSketch(lg_k=5).update_hashes(_h(b_keys))
    u1, u2 = a.union(b), b.union(a)
    assert u1.theta == u2.theta
    assert np.array_equal(u1.entries, u2.entries)
    assert (u1.entries < u1.theta).all()
    lo, hi = u1.bounds(num_std_dev=3)
    assert lo <= u1.estimate() <= hi


@SETTINGS
@given(keys)
def test_theta_serde_roundtrip_any_state(vals):
    sk = ThetaSketch(lg_k=5).update_hashes(_h(vals))
    back = ThetaSketch.deserialize(sk.serialize())
    assert back.theta == sk.theta
    assert np.array_equal(back.entries, sk.entries)
    assert back.estimate() == sk.estimate()


# -- hll ---------------------------------------------------------------------

@SETTINGS
@given(two_key_sets)
def test_hll_union_is_register_max_and_idempotent(ab):
    a_keys, b_keys = ab
    a = HllSketch(lg_k=6).update_keys(_kb(a_keys))
    b = HllSketch(lg_k=6).update_keys(_kb(b_keys))
    u = a.union(b)
    assert np.array_equal(u.regs, np.maximum(a.regs, b.regs))
    # idempotence: folding the same state in twice changes nothing
    again = u.union(b)
    assert np.array_equal(again.regs, u.regs)
    assert again.estimate() == u.estimate()


@SETTINGS
@given(keys)
def test_hll_serde_roundtrip_any_state(vals):
    sk = HllSketch(lg_k=6).update_keys(_kb(vals))
    back = HllSketch.deserialize(sk.serialize())
    assert np.array_equal(back.regs, sk.regs)
    assert back.estimate() == sk.estimate()


# -- bloom -------------------------------------------------------------------

@SETTINGS
@given(two_key_sets)
def test_bloom_never_false_negative_incl_union(ab):
    a_keys, b_keys = ab
    a = BloomFilter.with_accuracy(512, 0.01).insert_keys(_kb(a_keys))
    b = BloomFilter.with_accuracy(512, 0.01).insert_keys(_kb(b_keys))
    assert a.contains_keys(_kb(a_keys)).all()
    u = a.union(b)
    assert u.contains_keys(_kb(a_keys)).all()
    assert u.contains_keys(_kb(b_keys)).all()


# -- countmin ----------------------------------------------------------------

@SETTINGS
@given(two_key_sets)
def test_countmin_never_underestimates_and_merge_adds(ab):
    a_keys, b_keys = ab
    cm_a = CountMinSketch(3, 32).update_hashes(_h(a_keys))
    cm_b = CountMinSketch(3, 32).update_hashes(_h(b_keys))
    merged = cm_a.merge(cm_b)
    allv = list(a_keys) + list(b_keys)
    if not allv:
        return
    uniq, true_counts = np.unique(np.asarray(allv, dtype=np.uint64),
                                  return_counts=True)
    est = merged.estimate_hashes(_h(uniq))
    assert (est >= true_counts).all()
    assert merged.total_weight == len(allv)


# -- frequent items ----------------------------------------------------------

@SETTINGS
@given(two_key_sets)
def test_frequencies_bounds_contain_truth_after_merge(ab):
    a_keys, b_keys = ab
    fa = FrequentItemsSketch(16).update_counts(a_keys, [1] * len(a_keys))
    fb = FrequentItemsSketch(16).update_counts(b_keys, [1] * len(b_keys))
    m = fa.merge(fb)
    allv = list(a_keys) + list(b_keys)
    from collections import Counter
    for item, true in Counter(allv).items():
        assert m.lower_bound(item) <= true <= m.upper_bound(item)
    assert m.total_weight == len(allv)


# -- t-digest ----------------------------------------------------------------

floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=500)


@SETTINGS
@given(floats)
def test_tdigest_quantiles_monotone_and_bounded(vals):
    td = TDigest(k=50).update_values(np.asarray(vals))
    qs = [td.quantile(q) for q in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)]
    assert qs == sorted(qs)
    assert qs[0] == min(vals) and qs[-1] == max(vals)


@SETTINGS
@given(st.tuples(floats, floats))
def test_tdigest_merge_conserves_weight_and_extremes(ab):
    va, vb = ab
    a = TDigest(k=50).update_values(np.asarray(va))
    b = TDigest(k=50).update_values(np.asarray(vb))
    m = a.merge(b)
    m._compress()
    assert float(m.weights.sum()) == len(va) + len(vb)
    assert m.quantile(0.0) == min(va + vb)
    assert m.quantile(1.0) == max(va + vb)


# -- minhash -----------------------------------------------------------------

@SETTINGS
@given(two_key_sets)
def test_minhash_signature_of_union_is_elementwise_min(ab):
    """sig(A ∪ B) == min(sig(A), sig(B)) — the exact algebraic property
    that makes per-partition signature partials mergeable."""
    a_keys, b_keys = ab
    if not a_keys or not b_keys:
        return
    sa = minhash.signature_one(_h(a_keys), num_perm=32)
    sb = minhash.signature_one(_h(b_keys), num_perm=32)
    su = minhash.signature_one(_h(list(a_keys) + list(b_keys)), num_perm=32)
    assert np.array_equal(su, minhash.merge(sa, sb))
    assert np.array_equal(su, np.minimum(sa, sb))
