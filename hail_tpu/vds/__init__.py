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
    """Densify: fill variant-site entries from the covering reference blocks
    (reference `vds/methods.py` to_dense_mt): per sample, a variant position
    with no variant call but inside a defined reference block [start, END]
    becomes hom-ref with the block's GQ/DP."""
    from ..genetics.call import pack_diploid
    from ..ir.columns import Batch, PrimitiveColumn
    from ..matrixtable import MatrixBatch, MatrixStage, _concat_matrix_batches
    ref_mt, var_mt = vds.reference_data, vds.variant_data
    rst, vst = ref_mt._stage, var_mt._stage
    if rst.n_cols == 0 or not rst.contexts:
        return var_mt
    rmb = _concat_matrix_batches(rst.collect_batches(), rst)
    vmb = _concat_matrix_batches(vst.collect_batches(), vst)
    if rmb.n_rows == 0 or vmb.n_rows == 0:
        return var_mt
    n = vst.n_cols
    ref_locus = rmb.rows.columns['locus']
    ref_gpos = np.asarray(ref_locus.global_position())
    end_field = '__END' if '__END' in rmb.rows.columns else None
    if end_field is None:
        return var_mt
    ends = np.asarray(rmb.rows.columns[end_field].values, dtype=np.int64)
    end_miss = rmb.rows.columns[end_field].missing_mask()
    # END is a position on the same contig: global end = gpos + (END - pos)
    ref_pos = np.asarray(ref_locus.position, dtype=np.int64)
    end_gpos = ref_gpos + np.where(end_miss, 0, ends - ref_pos)
    var_gpos = np.asarray(vmb.rows.columns['locus'].global_position())

    gt_col = vmb.entries.get('GT')
    if gt_col is None:
        return var_mt
    gt = np.array(gt_col.values, dtype=np.int32, copy=True)
    gt_miss = np.array(gt_col.missing_mask(), copy=True)
    ref_gt_defined = ~rmb.entries['GT'].missing_mask() if 'GT' in rmb.entries else \
        np.ones((rmb.n_rows, n), dtype=bool)
    fill_fields = {}
    for f in ('DP', 'GQ', 'MIN_DP'):
        if f in rmb.entries and f in vmb.entries:
            fill_fields[f] = (np.asarray(rmb.entries[f].values),
                              rmb.entries[f].missing_mask())
    out_extra = {f: (np.array(vmb.entries[f].values, copy=True),
                     np.array(vmb.entries[f].missing_mask(), copy=True))
                 for f in fill_fields}
    hom_ref = np.int32(2 | (0 << 3) | (0 << 17))
    for s_i in range(n):
        defined = ref_gt_defined[:, s_i]
        if not defined.any():
            continue
        starts = ref_gpos[defined]
        ends_s = end_gpos[defined]
        block_rows = np.where(defined)[0]
        idx = np.searchsorted(starts, var_gpos, side='right') - 1
        valid = (idx >= 0)
        idxc = np.clip(idx, 0, len(starts) - 1)
        covered = valid & (ends_s[idxc] >= var_gpos)
        need = gt_miss[:, s_i] & covered
        if not need.any():
            continue
        gt[need, s_i] = hom_ref
        gt_miss[need, s_i] = False
        src_rows = block_rows[idxc[need]]
        for f, (vals, miss) in fill_fields.items():
            ov, om = out_extra[f]
            ov[need, s_i] = vals[src_rows, s_i]
            om[need, s_i] = miss[src_rows, s_i]
    ents = dict(vmb.entries)
    ents['GT'] = PrimitiveColumn(ht.tcall, gt, gt_miss if gt_miss.any() else None)
    for f, (ov, om) in out_extra.items():
        ents[f] = type(vmb.entries[f])(vmb.entries[f].typ, ov, om if om.any() else None) \
            if isinstance(vmb.entries[f], PrimitiveColumn) else vmb.entries[f]
    return MatrixTable(MatrixStage.from_batches(
        vst.globals, vst.cols, vst.row_key, vst.col_key, vst.row_type,
        vst.col_type, vst.entry_type, [MatrixBatch(vmb.rows, ents)]))


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
    from .combiner import new_combiner as nc
    return nc(**kwargs)


def load_combiner(path: str):
    from .combiner import load_combiner as lc
    return lc(path)
