"""Hardy-Weinberg equilibrium exact test (Levene-Haldane distribution).

Reference: `is/hail/stats/LeveneHaldane.scala` — fresh implementation of the
exact test (Wigginton/Cutler/Abecasis recurrence) returning
(het_freq_hwe, p_value) with Hail's definitions: het_freq_hwe is the
expected heterozygote frequency E[nAB]/n under the Levene-Haldane
distribution; p_value is the two-sided exact mid-p? No — Hail uses
P(X = nAB)/2 + P(more extreme) ... Hail's definition (LeveneHaldane.exactMidP):
p = min(1, sum_{P(x) <= P(obs)} P(x)), the standard exact test.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


@lru_cache(maxsize=65536)
def _lh_distribution(n: int, nA: int) -> Tuple[np.ndarray, np.ndarray]:
    """Levene-Haldane pmf over het counts for n diploid genotypes and nA copies
    of the rarer allele. Returns (het_counts, pmf)."""
    if n == 0 or nA == 0:
        return np.asarray([0]), np.asarray([1.0])
    # het counts share parity with nA; max possible is min(nA, 2n - nA)
    parity = nA % 2
    max_het = min(nA, 2 * n - nA)
    hets = np.arange(parity, max_het + 1, 2)
    # unnormalized recurrence (Wigginton et al. 2005):
    # P(nAB-2) / P(nAB) = nAB*(nAB-1) / (4*nAA_next*nBB_next) form; build in
    # log space from the mode outward for stability.
    probs = np.zeros(len(hets), dtype=np.float64)
    # start at the largest het count and recurse downward:
    # P(h-2)/P(h) = h*(h-1) / (4*(nAA(h)+1)*(nBB(h)+1))
    # where nAA(h) = (nA - h)/2, nBB(h) = n - h - nAA(h)
    logp = np.zeros(len(hets), dtype=np.float64)
    for i in range(len(hets) - 2, -1, -1):
        h = int(hets[i + 1])
        nAA = (nA - h) // 2
        nBB = n - h - nAA
        ratio = (h * (h - 1)) / (4.0 * (nAA + 1) * (nBB + 1))
        logp[i] = logp[i + 1] + np.log(ratio)
    m = np.max(logp)
    probs = np.exp(logp - m)
    probs /= probs.sum()
    return hets, probs


def hwe_test(n_hom_ref: int, n_het: int, n_hom_var: int,
             one_sided: bool = False) -> Tuple[float, float]:
    n = n_hom_ref + n_het + n_hom_var
    if n == 0:
        return (float('nan'), float('nan'))
    n_a = 2 * n_hom_ref + n_het  # copies of "A"
    n_b = 2 * n_hom_var + n_het
    nA = min(n_a, n_b)  # rarer allele copies
    hets, pmf = _lh_distribution(n, nA)
    e_het = float(np.sum(hets * pmf))
    het_freq = e_het / n
    idx = np.searchsorted(hets, n_het)
    p_obs = pmf[idx] if idx < len(hets) and hets[idx] == n_het else 0.0
    if one_sided:
        # excess-het mid-p (reference LeveneHaldane.rightMidP):
        # P(X > obs) + 0.5 * P(obs)
        p = float(np.sum(pmf[hets > n_het]) + 0.5 * p_obs)
        return het_freq, min(p, 1.0)
    # two-sided exact mid-p (reference LeveneHaldane.exactMidP): outcomes of
    # smaller probability fully, equal probability (incl. obs) at half weight
    tol = 1e-12
    less = pmf < p_obs * (1 - tol)
    equal = np.abs(pmf - p_obs) <= p_obs * tol
    p = float(np.sum(pmf[less]) + 0.5 * np.sum(pmf[equal]))
    return het_freq, min(p, 1.0)


def hwe_test_vec(n_hom_ref: np.ndarray, n_het: np.ndarray, n_hom_var: np.ndarray,
                 with_one_sided: bool = False):
    n_hom_ref = np.asarray(n_hom_ref).ravel()
    n_het = np.asarray(n_het).ravel()
    n_hom_var = np.asarray(n_hom_var).ravel()
    het_freq = np.empty(n_hom_ref.shape, dtype=np.float64)
    p = np.empty(n_hom_ref.shape, dtype=np.float64)
    p1 = np.empty(n_hom_ref.shape, dtype=np.float64)
    for i in range(n_hom_ref.size):
        het_freq[i], p[i] = hwe_test(int(n_hom_ref[i]), int(n_het[i]), int(n_hom_var[i]))
        if with_one_sided:
            _, p1[i] = hwe_test(int(n_hom_ref[i]), int(n_het[i]), int(n_hom_var[i]),
                                one_sided=True)
    if with_one_sided:
        return het_freq, p, p1
    return het_freq, p
