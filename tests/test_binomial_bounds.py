"""Exact binomial bounds vs the reference's own golden aggregate sums
(common/binomial_bounds.rs check_bounds test): sweep thousands of
(num_samples, theta) combos, accumulate ln(bound+1) sums in the same
order, and match the committed constants. This pins every regime branch
(closed forms, equivalence tables, tail walks, classic bound) at once.
"""

from __future__ import annotations

import math

import pytest

from datasketches_rust_spark.sketches import binomial_bounds as bb

# STD rows from binomial_bounds.rs tests (ci = 1,2,3 for each sweep);
# the (2000, 1e-7) sweep (12.8M evaluations) is skipped for runtime — the
# two smaller sweeps already cross every branch boundary (n=1, n<=120,
# n>120, theta<n/360, tail walk).
STD = {
    (20, 1e-3, 1): (7.083330682531043e+04, 8.530373642825481e+04,
                    3.273647725073409e+04, 3.734024243699785e+04, 57750.0),
    (20, 1e-3, 2): (6.539415269641498e+04, 8.945522372568645e+04,
                    3.222302546497840e+04, 3.904738469737429e+04, 57750.0),
    (20, 1e-3, 3): (6.006043493107306e+04, 9.318105731423477e+04,
                    3.186269956585285e+04, 4.096466221922520e+04, 57750.0),
    (200, 1e-5, 1): (2.275584770163813e+06, 2.347586549014998e+06,
                     1.020399409477305e+06, 1.036729927598294e+06, 920982.0),
    (200, 1e-5, 2): (2.243569126699713e+06, 2.374663344107342e+06,
                     1.017017233582122e+06, 1.042597845553438e+06, 920982.0),
    (200, 1e-5, 3): (2.210056231903739e+06, 2.400441267999687e+06,
                     1.014081235946986e+06, 1.049480769755676e+06, 920982.0),
}


def _run_test_aux(max_num_samples: int, ci: int, min_p: float):
    """Literal mirror of binomial_bounds.rs run_test_aux (same iteration
    and accumulation order)."""
    num_samples = 0
    sum1 = sum2 = sum3 = sum4 = 0.0
    count = 0
    while num_samples <= max_num_samples:
        p = 1.0
        while p >= min_p:
            lb = bb.lower_bound(num_samples, p, ci)
            ub = bb.upper_bound(num_samples, p, ci, False)
            sum1 += math.log(lb + 1.0)
            sum2 += math.log(ub + 1.0)
            count += 2
            if p < 1.0:
                lb = bb.lower_bound(num_samples, 1.0 - p, ci)
                ub = bb.upper_bound(num_samples, 1.0 - p, ci, False)
                sum3 += math.log(lb + 1.0)
                sum4 += math.log(ub + 1.0)
                count += 2
            p *= 0.99
        num_samples = max(num_samples + 1, (1001 * num_samples) // 1000)
    return sum1, sum2, sum3, sum4, float(count)


@pytest.mark.parametrize("max_n,min_p,ci", sorted(STD))
def test_bounds_match_reference_golden_sums(max_n, min_p, ci):
    got = _run_test_aux(max_n, ci, min_p)
    want = STD[(max_n, min_p, ci)]
    for g, w in zip(got, want):
        assert g / w == pytest.approx(1.0, abs=1e-12), (got, want)


def test_arg_validation():
    for bad_theta in (0.0, 1.01, -0.1):
        with pytest.raises(ValueError):
            bb.lower_bound(10, bad_theta, 1)
        with pytest.raises(ValueError):
            bb.upper_bound(10, bad_theta, 1, False)
    with pytest.raises(ValueError):
        bb.lower_bound(10, 0.5, 4)


def test_no_data_seen():
    assert bb.upper_bound(0, 0.5, 2, no_data_seen=True) == 0.0


def test_theta_sketch_uses_exact_bounds():
    """theta.bounds() must route through the exact binomial bounds and
    bracket the estimate; exact-mode returns the exact count."""
    import numpy as np
    from datasketches_rust_spark.hashing import hash_i64s
    from datasketches_rust_spark.sketches.theta import ThetaSketch
    sk = ThetaSketch(lg_k=8)
    sk.update_hashes(hash_i64s(np.arange(100000, dtype=np.int64)))
    assert sk.is_estimation_mode()
    for nsd in (1, 2, 3):
        lo, hi = sk.bounds(nsd)
        assert lo <= sk.estimate() <= hi
        n = int(sk.entries.size)
        p = float(sk.theta) / float((1 << 63) - 1)
        assert lo == pytest.approx(bb.lower_bound(n, p, nsd))
        assert hi == pytest.approx(bb.upper_bound(n, p, nsd))
    # widening with kappa
    l1, u1 = sk.bounds(1)
    l3, u3 = sk.bounds(3)
    assert l3 < l1 and u3 > u1