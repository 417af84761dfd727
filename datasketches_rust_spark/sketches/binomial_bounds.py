"""Exact binomial confidence bounds for sampling-based sketches (theta).

Port of the reference's bound logic (common/binomial_bounds.rs:257-425):
the estimate num_samples/theta is a binomial proportion; depending on the
regime the bound comes from
- the continuous "classic" quadratic bound (cont_classic_lb/ub) for
  num_samples > 120,
- the same classic bound driven by the Blyth-Still equivalence tables
  (binomial_tables.py) when num_samples <= 120 and theta < k/360,
- an exact tail-sum walk over the negative-binomial posterior
  (special_n_star / special_n_prime) in the remaining small regime,
- closed forms for num_samples in {0, 1} and theta ~ 1.

This replaces the Gaussian approximation previously used in theta.py,
which diverges from the reference at small n / high confidence.
"""

from __future__ import annotations

import math

from datasketches_rust_spark.sketches.binomial_tables import (LB_EQUIV_TABLE,
                                                              UB_EQUIV_TABLE)

# one-sided Gaussian tail probabilities for kappa = 0..3. These are the
# reference's EXACT published constants (common/num_std_dev.rs:24-29),
# which differ from math.erf in the 7th decimal (historical erf
# approximation inherited from the original implementation) — the golden
# aggregate sums in tests/test_binomial_bounds.py only reproduce with
# these values.
_DELTA_OF_NUM_STD_DEVS = [
    0.5000000000000000000,
    0.1586553191586026479,
    0.0227502618904135701,
    0.0013498126861731796,
]


def lower_bound(num_samples: int, theta: float, num_std_dev: int) -> float:
    if not (0.0 < theta <= 1.0):
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    if not (1 <= num_std_dev <= 3):
        raise ValueError("num_std_dev must be 1, 2 or 3")
    estimate = num_samples / theta
    lb = _approx_lb(num_samples, theta, num_std_dev)
    return min(estimate, max(float(num_samples), lb))


def upper_bound(num_samples: int, theta: float, num_std_dev: int,
                no_data_seen: bool = False) -> float:
    if no_data_seen:
        return 0.0
    if not (0.0 < theta <= 1.0):
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    if not (1 <= num_std_dev <= 3):
        raise ValueError("num_std_dev must be 1, 2 or 3")
    estimate = num_samples / theta
    return max(estimate, _approx_ub(num_samples, theta, num_std_dev))


def _cont_classic_lb(num_samples: int, theta: float, nsd: float) -> float:
    n_hat = (num_samples - 0.5) / theta
    b = nsd * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b - d


def _cont_classic_ub(num_samples: int, theta: float, nsd: float) -> float:
    n_hat = (num_samples + 0.5) / theta
    b = nsd * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b + d


def _special_n_star(num_samples: int, p: float, delta: float) -> float | None:
    """Largest N with Prob[at most num_samples-1 successes] <= delta —
    exact tail walk (binomial_bounds.rs:311-331)."""
    q = 1.0 - p
    if num_samples / p >= 500.0:
        return None
    cur_term = p ** num_samples
    if cur_term <= 1e-100:
        return None
    tot = cur_term
    m = num_samples
    while tot <= delta:
        cur_term = (cur_term * q * m) / (m + 1 - num_samples)
        tot += cur_term
        m += 1
    return float(m - 1)


def _special_n_prime_b(num_samples: int, p: float, delta: float) -> float | None:
    q = 1.0 - p
    cur_term = p ** num_samples
    if cur_term <= 1e-100:
        return None
    tot = cur_term
    m = num_samples
    while tot < 1.0 - delta:
        cur_term = (cur_term * q * m) / (m + 1 - num_samples)
        tot += cur_term
        m += 1
    return float(m)


def _special_n_prime_f(num_samples: int, p: float, delta: float) -> float | None:
    if num_samples / p >= 500.0:
        return None
    return _special_n_prime_b(num_samples + 1, p, delta)


def _approx_lb(num_samples: int, theta: float, nsd: int) -> float:
    if theta == 1.0:
        return float(num_samples)
    if num_samples == 0:
        return 0.0
    if num_samples == 1:
        delta = _DELTA_OF_NUM_STD_DEVS[nsd]
        return math.floor(math.log(1.0 - delta) / math.log(1.0 - theta))
    if num_samples > 120:
        return _cont_classic_lb(num_samples, theta, float(nsd)) - 0.5
    if theta > 1.0 - 1e-5:
        return float(num_samples)
    if theta < num_samples / 360.0:
        nsd_eq = LB_EQUIV_TABLE[3 * num_samples + (nsd - 1)]
        return _cont_classic_lb(num_samples, theta, nsd_eq) - 0.5
    delta = _DELTA_OF_NUM_STD_DEVS[nsd]
    result = _special_n_star(num_samples, theta, delta)
    return float(num_samples) if result is None else result


def _approx_ub(num_samples: int, theta: float, nsd: int) -> float:
    if theta == 1.0:
        return float(num_samples)
    if num_samples == 0:
        delta = _DELTA_OF_NUM_STD_DEVS[nsd]
        return math.ceil(math.log(delta) / math.log(1.0 - theta))
    if num_samples > 120:
        return _cont_classic_ub(num_samples, theta, float(nsd)) + 0.5
    if theta > 1.0 - 1e-5:
        return float(num_samples + 1)
    if theta < num_samples / 360.0:
        nsd_eq = UB_EQUIV_TABLE[3 * num_samples + (nsd - 1)]
        return _cont_classic_ub(num_samples, theta, nsd_eq) + 0.5
    delta = _DELTA_OF_NUM_STD_DEVS[nsd]
    result = _special_n_prime_f(num_samples, theta, delta)
    return float(num_samples + 1) if result is None else result
