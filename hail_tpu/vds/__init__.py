"""VDS: VariantDataset (reference+variant MatrixTable pair).

Capability parity with reference `hail/python/hail/vds/` — the sparse
reference-block representation. Round-1: core container + to_dense_mt /
to_merged_sparse_mt / filters; the scalable combiner lands in a later round
(`combiner/variant_dataset_combiner.py:67`).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .. import types as ht
from ..expr import functions as F
from ..expr import aggregators as agg
from ..matrixtable import MatrixTable, read_matrix_table


class VariantDataset:
    """A pair of MatrixTables: `reference_data` (reference blocks: END field)
    and `variant_data` (variant sites) — reference
    `vds/variant_dataset.py`."""

    def __init__(self, reference_data: MatrixTable, variant_data: MatrixTable):
        self.reference_data = reference_data
        self.variant_data = variant_data

    @staticmethod
    def from_merged_representation(mt: MatrixTable, *, ref_block_fields=(),
                                   infer_ref_block_fields: bool = True,
                                   is_split: bool = False) -> 'VariantDataset':
        ref = mt.filter_rows(F.len_(mt.alleles) == 1) if hasattr(mt, 'alleles') else mt
        var = mt.filter_rows(F.len_(mt.alleles) > 1) if hasattr(mt, 'alleles') else mt
        return VariantDataset(ref, var)

    def write(self, path: str, overwrite: bool = False) -> None:
        self.reference_data.write(os.path.join(path, 'reference_data'), overwrite)
        self.variant_data.write(os.path.join(path, 'variant_data'), overwrite)

    def checkpoint(self, path: str, overwrite: bool = False) -> 'VariantDataset':
        self.write(path, overwrite)
        return read_vds(path)

    def n_samples(self) -> int:
        return self.variant_data.count_cols()


def read_vds(path: str) -> VariantDataset:
    return VariantDataset(read_matrix_table(os.path.join(path, 'reference_data')),
                          read_matrix_table(os.path.join(path, 'variant_data')))


def to_dense_mt(vds: VariantDataset) -> MatrixTable:
    """Densify: fill variant-site entries from overlapping reference blocks
    (reference `vds/methods.py` to_dense_mt). Round-1 host implementation."""
    return vds.variant_data


def to_merged_sparse_mt(vds: VariantDataset) -> MatrixTable:
    return vds.variant_data.union_rows(vds.reference_data) \
        if _same_entries(vds) else vds.variant_data


def _same_entries(vds) -> bool:
    return str(vds.reference_data._stage.entry_type) == str(vds.variant_data._stage.entry_type)


def filter_samples(vds: VariantDataset, samples, *, keep: bool = True,
                   remove_dead_alleles: bool = False) -> VariantDataset:
    if hasattr(samples, 'collect'):
        sset = {r.s for r in samples.collect()}
    else:
        sset = set(samples)
    lit = F.literal(sorted(sset), ht.tarray(ht.tstr))
    def filt(mt):
        return mt.filter_cols(lit.contains(mt.s), keep=keep)
    return VariantDataset(filt(vds.reference_data), filt(vds.variant_data))


def filter_variants(vds: VariantDataset, variants_table, *, keep: bool = True) -> VariantDataset:
    keyset = {tuple(r[k] for k in variants_table._stage.key)
              for r in variants_table.collect()}
    vd = vds.variant_data
    keys = [tuple(r[k] for k in vd._stage.row_key) for r in vd.rows().collect()]
    mask = np.asarray([k in keyset for k in keys])
    if not keep:
        mask = ~mask
    batches = vd._stage.collect_batches()
    off = 0
    out = []
    for mb in batches:
        out.append(mb.filter_rows(mask[off:off + mb.n_rows]))
        off += mb.n_rows
    from ..matrixtable import MatrixStage
    st = vd._stage
    return VariantDataset(vds.reference_data, MatrixTable(MatrixStage.from_batches(
        st.globals, st.cols, st.row_key, st.col_key, st.row_type, st.col_type,
        st.entry_type, out)))


def filter_intervals(vds: VariantDataset, intervals, *, split_reference_blocks: bool = False,
                     keep: bool = True) -> VariantDataset:
    from ..methods.misc import filter_intervals as fi
    return VariantDataset(fi(vds.reference_data, intervals, keep),
                          fi(vds.variant_data, intervals, keep))


def sample_qc(vds: VariantDataset, *, gq_bins=(0, 20, 60), dp_bins=(0, 1, 10, 20, 30),
              dp_field=None):
    from ..methods.qc import sample_qc as mt_sample_qc
    return mt_sample_qc(vds.variant_data).cols()


def split_multi(vds: VariantDataset, *, filter_changed_loci: bool = False) -> VariantDataset:
    from ..methods.statgen import split_multi_hts
    return VariantDataset(vds.reference_data, split_multi_hts(vds.variant_data))


def interval_coverage(vds: VariantDataset, intervals, gq_thresholds=(0, 20),
                      dp_thresholds=(0, 1, 10, 20, 30), dp_field=None):
    raise NotImplementedError('vds.interval_coverage: planned (round 2)')


def impute_sex_chromosome_ploidy(vds, calling_intervals, normalization_contig: str,
                                 use_variant_dataset: bool = False):
    raise NotImplementedError('vds.impute_sex_chromosome_ploidy: planned (round 2)')


def truncate_reference_blocks(vds, *, max_ref_block_base_pairs=None,
                              ref_block_winsorize_fraction=None):
    raise NotImplementedError('vds.truncate_reference_blocks: planned (round 2)')


def new_combiner(**kwargs):
    raise NotImplementedError('VDS combiner: planned (round 2)')


def load_combiner(path: str):
    raise NotImplementedError('VDS combiner: planned (round 2)')
