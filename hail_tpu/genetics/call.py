"""Genotype calls, packed into int32 for vectorized columns.

Capability parity with reference `is/hail/variant/Call.scala:14-77` and
`hail/python/hail/genetics/call.py`, with our own packing scheme designed
for numpy/jax bit ops:

    bits [0:2)  ploidy (0, 1, or 2)
    bit  [2]    phased
    bits [3:17) allele index j (first allele), 14 bits
    bits [17:32) allele index k (second allele), 15 bits

Missing calls are represented by the column's missing mask, not a sentinel.
All `calls_*` functions are vectorized over packed int32 arrays and work on
both numpy and jax.numpy arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

PLOIDY_MASK = 0x3
PHASED_BIT = 0x4
J_SHIFT = 3
J_MASK = (1 << 14) - 1
K_SHIFT = 17
K_MASK = (1 << 15) - 1
MAX_ALLELE = (1 << 14) - 1


def pack_call(alleles: Sequence[int], phased: bool = False) -> int:
    ploidy = len(alleles)
    if ploidy > 2:
        raise ValueError(f'ploidy > 2 not supported: {alleles}')
    j = alleles[0] if ploidy >= 1 else 0
    k = alleles[1] if ploidy == 2 else 0
    if j > MAX_ALLELE or k > K_MASK or j < 0 or k < 0:
        raise ValueError(f'allele index out of range: {alleles}')
    return ploidy | (PHASED_BIT if phased else 0) | (j << J_SHIFT) | (k << K_SHIFT)


class Call:
    """An immutable genotype call: an ordered list of allele indices + phasing."""

    __slots__ = ('_alleles', '_phased')

    def __init__(self, alleles: Sequence[int], phased: bool = False):
        if len(alleles) > 2:
            raise NotImplementedError(
                'Calls with greater than 2 alleles are not supported.')
        self._alleles: List[int] = list(alleles)
        self._phased = phased

    @classmethod
    def from_packed(cls, packed: int) -> 'Call':
        ploidy = packed & PLOIDY_MASK
        phased = bool(packed & PHASED_BIT)
        alleles = []
        if ploidy >= 1:
            alleles.append((packed >> J_SHIFT) & J_MASK)
        if ploidy == 2:
            alleles.append((packed >> K_SHIFT) & K_MASK)
        return cls(alleles, phased)

    @property
    def packed(self) -> int:
        return pack_call(self._alleles, self._phased)

    @property
    def alleles(self) -> List[int]:
        return list(self._alleles)

    @property
    def ploidy(self) -> int:
        return len(self._alleles)

    @property
    def phased(self) -> bool:
        return self._phased

    def __getitem__(self, i: int) -> int:
        return self._alleles[i]

    def is_haploid(self) -> bool:
        return self.ploidy == 1

    def is_diploid(self) -> bool:
        return self.ploidy == 2

    def is_hom_ref(self) -> bool:
        return len(self._alleles) > 0 and all(a == 0 for a in self._alleles)

    def is_hom_var(self) -> bool:
        return len(self._alleles) > 0 and all(a == self._alleles[0] and a > 0 for a in self._alleles)

    def is_het(self) -> bool:
        return self.ploidy == 2 and self._alleles[0] != self._alleles[1]

    def is_het_ref(self) -> bool:
        return self.is_het() and 0 in self._alleles

    def is_het_non_ref(self) -> bool:
        return self.is_het() and 0 not in self._alleles

    def is_non_ref(self) -> bool:
        return any(a != 0 for a in self._alleles)

    def n_alt_alleles(self) -> int:
        return sum(1 for a in self._alleles if a != 0)

    def unphased_diploid_gt_index(self) -> int:
        if self.ploidy != 2:
            raise ValueError('unphased_diploid_gt_index requires diploid call')
        j, k = sorted(self._alleles)
        return k * (k + 1) // 2 + j

    def one_hot_alleles(self, n_alleles: int) -> List[int]:
        out = [0] * n_alleles
        for a in self._alleles:
            out[a] += 1
        return out

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Call):
            return NotImplemented
        return self._alleles == other._alleles and self._phased == other._phased

    def __hash__(self) -> int:
        return hash((tuple(self._alleles), self._phased))

    def __str__(self) -> str:
        sep = '|' if self._phased else '/'
        return sep.join(str(a) for a in self._alleles)

    def __repr__(self) -> str:
        return f'Call(alleles={self._alleles}, phased={self._phased})'


# ---------------------------------------------------------------------------
# Vectorized operations over packed-call arrays (numpy or jax.numpy).
# `missing` masks are handled by the caller (expression evaluator).
# ---------------------------------------------------------------------------

def calls_ploidy(packed):
    return (packed & PLOIDY_MASK).astype(np.int32) if hasattr(packed, 'astype') else packed & PLOIDY_MASK


def calls_is_phased(packed):
    return (packed & PHASED_BIT) != 0


def calls_allele_j(packed):
    return (packed >> J_SHIFT) & J_MASK


def calls_allele_k(packed):
    return (packed >> K_SHIFT) & K_MASK


def calls_n_alt_alleles(packed):
    """Number of non-reference alleles; 0 for ploidy-0 calls."""
    ploidy = packed & PLOIDY_MASK
    j = calls_allele_j(packed)
    k = calls_allele_k(packed)
    nj = ((j != 0) & (ploidy >= 1)).astype(np.int32)
    nk = ((k != 0) & (ploidy == 2)).astype(np.int32)
    return nj + nk


def calls_is_het(packed):
    return ((packed & PLOIDY_MASK) == 2) & (calls_allele_j(packed) != calls_allele_k(packed))


def calls_is_hom_ref(packed):
    ploidy = packed & PLOIDY_MASK
    return (ploidy > 0) & (calls_allele_j(packed) == 0) & ((ploidy < 2) | (calls_allele_k(packed) == 0))


def calls_is_hom_var(packed):
    ploidy = packed & PLOIDY_MASK
    j = calls_allele_j(packed)
    k = calls_allele_k(packed)
    return (ploidy > 0) & (j > 0) & ((ploidy < 2) | (j == k))


def calls_is_het_ref(packed):
    j = calls_allele_j(packed)
    k = calls_allele_k(packed)
    return calls_is_het(packed) & ((j == 0) | (k == 0))


def calls_is_het_non_ref(packed):
    j = calls_allele_j(packed)
    k = calls_allele_k(packed)
    return calls_is_het(packed) & (j != 0) & (k != 0)


def calls_is_non_ref(packed):
    return calls_n_alt_alleles(packed) > 0


def calls_unphased_diploid_gt_index(packed):
    j = calls_allele_j(packed)
    k = calls_allele_k(packed)
    lo = np.minimum(j, k)
    hi = np.maximum(j, k)
    return hi * (hi + 1) // 2 + lo


def pack_diploid(j, k, phased=False):
    """Vectorized packing of diploid calls from allele-index arrays."""
    base = 2 | (PHASED_BIT if phased else 0)
    return (base | (j.astype(np.int32) << J_SHIFT) | (k.astype(np.int32) << K_SHIFT)).astype(np.int32)
