"""Batch DSL helpers (reference hailtop/batch/utils.py): tree-aggregation
concatenate/plink_merge over batch jobs."""

from __future__ import annotations

import math
from typing import List, Optional

from .resource import ResourceFile
from .batch import Batch


class BatchException(Exception):
    pass


def _digits_needed(n: int) -> int:
    return max(1, int(math.log10(n)) + 1) if n > 0 else 1


def _grouped(size, xs):
    out = []
    for i in range(0, len(xs), size):
        out.append(xs[i:i + size])
    return out


def _combine(combop, b: Batch, name: str, xs, branching_factor: int = 100):
    n_levels = math.ceil(math.log(len(xs), branching_factor)) if len(xs) > 1 else 1
    level_digits = _digits_needed(n_levels)
    level = 1
    while len(xs) > 1:
        branch_digits = _digits_needed((len(xs) + branching_factor - 1) // branching_factor)
        grouped_xs = _grouped(branching_factor, xs)
        xs = [combop(b, f'{name}-{level:0{level_digits}}-{i:0{branch_digits}}', group)
              for i, group in enumerate(grouped_xs)]
        level += 1
    assert len(xs) == 1
    return xs[0]


def concatenate(b: Batch, files: List[ResourceFile],
                image: Optional[str] = None,
                branching_factor: int = 100) -> ResourceFile:
    """Concatenate files by tree aggregation (reference utils.py:11)."""
    def _concatenate(b, name, xs):
        j = b.new_job(name=name)
        if image:
            j.image(image)
        j.command(f'cat {" ".join([str(x) for x in xs])} > {j.ofile}')
        return j.ofile

    if len(files) == 0:
        raise BatchException('Must have at least one file to concatenate.')
    if not all(isinstance(f, ResourceFile) for f in files):
        raise BatchException('Invalid input file(s) - all inputs must be resource files.')
    return _combine(_concatenate, b, 'concatenate', files,
                    branching_factor=branching_factor)


def plink_merge(b: Batch, bfiles, image: Optional[str] = None,
                branching_factor: int = 100):
    """Merge binary PLINK files by tree aggregation (reference utils.py:64)."""
    def _plink_merge(b, name, xs):
        assert xs
        if len(xs) == 1:
            return xs[0]
        j = b.new_job(name=name)
        if image:
            j.image(image)
        for k, v in enumerate(xs[1:]):
            j.command(f'echo "{v.bed} {v.bim} {v.fam}" >> {j.merge_list}')
        j.command(f'plink --bfile {xs[0]} --merge-list {j.merge_list} '
                  f'--out {j.ofile}')
        return j.ofile

    if len(bfiles) == 0:
        raise BatchException('Must have at least one binary PLINK file.')
    return _combine(_plink_merge, b, 'plink-merge', bfiles,
                    branching_factor=branching_factor)
