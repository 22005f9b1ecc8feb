"""Generalized chi-squared CDF (weighted sum of noncentral chi-squares plus a
Gaussian term).

Reference: `is/hail/stats/GeneralizedChiSquaredDistribution.scala` (Davies'
algorithm). Fresh implementation using Imhof's (1961) numerical inversion of
the characteristic function, which matches Davies' method to the requested
accuracy for the SKAT use case.

Q = sum_j w_j * chi2(k_j, lambda_j) + mu + sigma * N(0,1);  returns P(Q <= x).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np
from scipy.integrate import quad


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

    try:
        val, err = quad(integrand, 0.0, np.inf, limit=200, epsabs=min_accuracy / 10)
        p_gt = 0.5 + val / math.pi
        p = 1.0 - p_gt
        p = min(max(p, 0.0), 1.0)
        converged = err < min_accuracy * 10 or err < 1e-4
        return p, 0, bool(converged), 0
    except Exception:
        return float('nan'), 0, False, 1
