"""Generalized chi-squared CDF (weighted sum of noncentral chi-squares plus a
Gaussian term).

Reference: `is/hail/stats/GeneralizedChiSquaredDistribution.scala` (Davies'
algorithm). Fresh implementation:

* central case with all-positive weights (the SKAT path) uses Ruben's (1962)
  series expansion  P(sum_i w_i chi2_{k_i} <= x) = sum_j c_j F_{N+2j}(x/beta)
  with beta <= min(w): all c_j >= 0, sum c_j = 1, so the truncation error is
  rigorously bounded by the un-accumulated mass — far more accurate than
  characteristic-function quadrature for small numbers of terms;
* the general case (negative weights, noncentrality, Gaussian term) falls
  back to Imhof's (1961) numerical inversion.

Q = sum_j w_j * chi2(k_j, lambda_j) + mu + sigma * N(0,1);  returns P(Q <= x).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np
from scipy.integrate import quad
from scipy.stats import chi2 as _chi2


def _ruben_central(x: float, w: np.ndarray, k: np.ndarray,
                   max_terms: int = 100_000, eps: float = 1e-14):
    """P(sum_i w_i chi2_{k_i} <= x) for w_i > 0, x > 0 via Ruben's series.

    Returns (cdf, converged). Coefficient recurrence (Ruben 1962; see also
    Farebrother's AS 204): with beta <= min(w), ratio_i = 1 - beta/w_i,
        g_m = 0.5 * sum_i k_i * ratio_i^m
        c_0 = prod_i (beta/w_i)^(k_i/2)
        c_j = (1/j) * sum_{r=0}^{j-1} g_{j-r} c_r
    all c_j >= 0 and sum_j c_j = 1, so the remainder after J terms is bounded
    by 1 - sum_{j<=J} c_j.
    """
    beta = 0.90625 * float(np.min(w))
    ratio = 1.0 - beta / w
    n_total = float(np.sum(k))
    log_c0 = 0.5 * float(np.sum(k * np.log(beta / w)))
    if log_c0 < -700.0:  # c_0 underflows; let the caller fall back
        return float('nan'), float('nan'), False
    xb = x / beta
    c = np.empty(1024, dtype=np.float64)
    g = np.empty(1024, dtype=np.float64)
    c[0] = math.exp(log_c0)
    # incremental central-chi2 CDF over df: F_{N+2(j+1)}(x) = F_{N+2j}(x) - t_j
    # with t_j = (x/2)^{N/2+j} e^{-x/2} / Gamma(N/2+j+1),
    # t_{j+1} = t_j * (x/2) / (N/2+j+1) — O(1) per term instead of a scipy
    # call (wide eigenvalue spreads need 1e4-1e6 terms)
    from scipy.special import gammaln
    half = n_total / 2.0
    cdf_j = float(_chi2.cdf(xb, n_total))
    sf_j = float(_chi2.sf(xb, n_total))
    t_j = math.exp(half * math.log(xb / 2.0) - xb / 2.0 - gammaln(half + 1.0)) \
        if xb > 0 else 0.0
    total = c[0] * cdf_j
    # the survival sum keeps full *relative* precision in the far right tail
    # (1 - cdf would round to 0 below ~2^-53), which the SKAT tail needs
    sf = c[0] * sf_j
    mass = c[0]
    pw = ratio.copy()  # ratio^m, updated in place
    j = 0
    # the c_j recurrence is O(J^2); past ~20k terms Imhof is cheaper, so
    # bail out and let the caller fall back
    cap = min(max_terms, 20_000)
    while mass < 1.0 - eps and j + 1 < cap:
        j += 1
        if j >= len(c):
            c = np.concatenate([c, np.empty(len(c), dtype=np.float64)])
            g = np.concatenate([g, np.empty(len(g), dtype=np.float64)])
        g[j] = 0.5 * float(np.sum(k * pw))
        pw *= ratio
        # c_j = (1/j) * sum_{r=0}^{j-1} g_{j-r} c_r  (dot of reversed g slice)
        c[j] = float(np.dot(g[1:j + 1][::-1], c[:j])) / j
        cdf_j -= t_j
        sf_j += t_j
        t_j *= (xb / 2.0) / (half + j)
        total += c[j] * cdf_j
        sf += c[j] * sf_j
        mass += c[j]
    return (min(max(total, 0.0), 1.0), min(max(sf, 0.0), 1.0),
            bool(mass >= 1.0 - eps))


def _imhof(x0: float, w: np.ndarray, k: np.ndarray, lam: np.ndarray,
           sigma: float, min_accuracy: float):
    """Imhof (1961) characteristic-function inversion for the general case."""
    def theta(u):
        t = 0.5 * np.sum(k * np.arctan(w * u) + lam * w * u / (1.0 + (w * u) ** 2))
        return t - 0.5 * x0 * u

    def rho(u):
        r = np.prod((1.0 + (w * u) ** 2) ** (0.25 * k)) * np.exp(
            0.5 * np.sum(lam * (w * u) ** 2 / (1.0 + (w * u) ** 2)))
        return r * np.exp(0.125 * sigma ** 2 * u ** 2)

    def integrand(u):
        if u == 0.0:
            # limit: theta(u)/u -> 0.5*sum(k*w + lam*w) - 0.5*x0
            return 0.5 * np.sum(k * w + lam * w) - 0.5 * x0
        return math.sin(theta(u)) / (u * rho(u))

    val, err = quad(integrand, 0.0, np.inf, limit=200, epsabs=min_accuracy / 10)
    p_gt = 0.5 + val / math.pi
    p = 1.0 - p_gt
    p = min(max(p, 0.0), 1.0)
    converged = err < min_accuracy * 10 or err < 1e-4
    return p, bool(converged)


def pgenchisq_py(x: float, w: Sequence[float], k: Sequence[int],
                 lam: Sequence[float], mu: float, sigma: float,
                 max_iterations: int = 10**5, min_accuracy: float = 1e-6
                 ) -> Tuple[float, int, bool, int]:
    w = np.asarray(w, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    lam = np.asarray(lam, dtype=np.float64)
    x0 = x - mu

    if w.size == 0 and sigma == 0.0:
        return (1.0 if x0 >= 0 else 0.0), 0, True, 0

    central_positive = (sigma == 0.0 and w.size > 0 and np.all(w > 0)
                        and np.all(lam == 0.0))
    if central_positive:
        if x0 <= 0.0:
            return 0.0, 0, True, 0
        p, _, ok = _ruben_central(x0, w, k, max_terms=max_iterations)
        if ok and not math.isnan(p):
            return p, 0, True, 0

    try:
        p, converged = _imhof(x0, w, k, lam, sigma, min_accuracy)
        return p, 0, converged, 0
    except Exception:
        return float('nan'), 0, False, 1


def pgenchisq_sf_py(x: float, w: Sequence[float], k: Sequence[int],
                    lam: Sequence[float], mu: float, sigma: float,
                    max_iterations: int = 10**5, min_accuracy: float = 1e-6
                    ) -> Tuple[float, bool]:
    """P(Q > x) with full relative precision in the right tail when possible.

    For the central all-positive case (the SKAT path) the Ruben survival sum
    preserves tiny tail probabilities (e.g. 1e-24) that `1 - cdf` would round
    to 0; otherwise falls back to the complement of :func:`pgenchisq_py`.
    """
    w_arr = np.asarray(w, dtype=np.float64)
    k_arr = np.asarray(k, dtype=np.float64)
    lam_arr = np.asarray(lam, dtype=np.float64)
    x0 = x - mu
    if (sigma == 0.0 and w_arr.size > 0 and np.all(w_arr > 0)
            and np.all(lam_arr == 0.0)):
        if x0 <= 0.0:
            return 1.0, True
        _, sf, ok = _ruben_central(x0, w_arr, k_arr, max_terms=max_iterations)
        if ok and not math.isnan(sf):
            return sf, True
    p, _, conv, fault = pgenchisq_py(x, w, k, lam, mu, sigma,
                                     max_iterations, min_accuracy)
    return max(min(1.0 - p, 1.0), 0.0), bool(conv and fault == 0)
