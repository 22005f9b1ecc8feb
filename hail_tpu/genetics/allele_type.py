"""Allele classification (SNP/insertion/deletion/...).

Parity with reference `hail/python/hail/genetics/allele_type.py` and the
AlleleType logic in `is/hail/variant/AltAlleleMethods` — fresh implementation.
"""

from __future__ import annotations

from enum import Enum


class AlleleType(Enum):
    UNKNOWN = 0
    SNP = 1
    MNP = 2
    INSERTION = 3
    DELETION = 4
    COMPLEX = 5
    STAR = 6
    SYMBOLIC = 7
    TRANSITION = 8
    TRANSVERSION = 9

    def __str__(self):
        return self.name

    @property
    def pretty_name(self):
        # reference genetics/allele_type.py _ALLELE_STRS: acronyms stay
        # uppercase ('SNP', 'MNP'), the rest are capitalized ('Insertion')
        if self.name in ('SNP', 'MNP'):
            return self.name
        return self.name.capitalize()


_TRANSITIONS = {('A', 'G'), ('G', 'A'), ('C', 'T'), ('T', 'C')}


def allele_type(ref: str, alt: str, include_ti_tv: bool = False) -> AlleleType:
    if alt == '*':
        return AlleleType.STAR
    if any(c not in 'ACGTNacgtn' for c in ref) or any(c not in 'ACGTNacgtn' for c in alt):
        return AlleleType.SYMBOLIC
    if len(ref) == len(alt):
        if len(ref) == 1:
            if ref == alt:
                return AlleleType.UNKNOWN
            if include_ti_tv:
                if (ref.upper(), alt.upper()) in _TRANSITIONS:
                    return AlleleType.TRANSITION
                return AlleleType.TRANSVERSION
            return AlleleType.SNP
        n_mismatch = sum(1 for a, b in zip(ref, alt) if a != b)
        if n_mismatch == 1:
            return AlleleType.SNP if not include_ti_tv else (
                AlleleType.TRANSITION
                if next((a.upper(), b.upper()) for a, b in zip(ref, alt) if a != b) in _TRANSITIONS
                else AlleleType.TRANSVERSION
            )
        return AlleleType.MNP
    if len(ref) < len(alt):
        if ref and alt.startswith(ref):
            return AlleleType.INSERTION
        return AlleleType.COMPLEX
    if alt and ref.startswith(alt):
        return AlleleType.DELETION
    return AlleleType.COMPLEX


def is_snp(ref: str, alt: str) -> bool:
    return allele_type(ref, alt) == AlleleType.SNP


def is_mnp(ref: str, alt: str) -> bool:
    return allele_type(ref, alt) == AlleleType.MNP


def is_insertion(ref: str, alt: str) -> bool:
    return allele_type(ref, alt) == AlleleType.INSERTION


def is_deletion(ref: str, alt: str) -> bool:
    return allele_type(ref, alt) == AlleleType.DELETION


def is_indel(ref: str, alt: str) -> bool:
    return allele_type(ref, alt) in (AlleleType.INSERTION, AlleleType.DELETION)


def is_star(ref: str, alt: str) -> bool:
    return alt == '*'


def is_complex(ref: str, alt: str) -> bool:
    return allele_type(ref, alt) == AlleleType.COMPLEX

def is_transition(ref: str, alt: str) -> bool:
    return allele_type(ref, alt, include_ti_tv=True) == AlleleType.TRANSITION


def is_transversion(ref: str, alt: str) -> bool:
    return allele_type(ref, alt, include_ti_tv=True) == AlleleType.TRANSVERSION
