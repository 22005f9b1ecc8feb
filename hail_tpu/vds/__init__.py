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
from ..ir import columns as C
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


def _ref_block_arrays(vds):
    """(starts_gpos, ends_gpos, per-sample defined mask, dp values|None, rows)"""
    from ..matrixtable import _concat_matrix_batches
    rst = vds.reference_data._stage
    rmb = _concat_matrix_batches(rst.collect_batches(), rst)
    loc = rmb.rows.columns['locus']
    gp = np.asarray(loc.global_position())
    pos = np.asarray(loc.position, dtype=np.int64)
    endf = rmb.rows.columns.get('__END')
    ends = np.asarray(endf.values, dtype=np.int64) if endf is not None else pos
    end_gp = gp + (ends - pos)
    gt = rmb.entries.get('GT')
    defined = ~gt.missing_mask() if gt is not None else \
        np.ones((rmb.n_rows, rst.n_cols), dtype=bool)
    dp = rmb.entries.get('DP')
    return gp, end_gp, defined, dp, rmb


def interval_coverage(vds: VariantDataset, intervals, gq_thresholds=(0, 20),
                      dp_thresholds=(0, 1, 10, 20, 30), dp_field=None):
    """Per (interval, sample) coverage summary from reference blocks
    (reference `vds/methods.py` interval_coverage): bases covered, mean DP,
    and fraction-over-DP/GQ-threshold columns. Returns a MatrixTable with
    interval rows and per-sample entries."""
    from ..ir.columns import Batch, ObjectColumn, PrimitiveColumn
    from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable
    from ..utils.structs import Interval
    gp, end_gp, defined, dp_col, rmb = _ref_block_arrays(vds)
    rst = vds.reference_data._stage
    n = rst.n_cols
    dpv = np.asarray(dp_col.values, dtype=np.float64) if dp_col is not None else None
    dpm = dp_col.missing_mask() if dp_col is not None else None
    gq_col = rmb.entries.get('GQ')
    gqv = np.asarray(gq_col.values, dtype=np.float64) if gq_col is not None else None

    ivs = []
    if hasattr(intervals, 'collect'):
        key0 = intervals._stage.key[0]
        ivs = [r[key0] for r in intervals.collect()]
    else:
        ivs = list(intervals)
    m = len(ivs)
    bases_cov = np.zeros((m, n))
    dp_sum = np.zeros((m, n))
    frac_dp = {t: np.zeros((m, n)) for t in dp_thresholds}
    frac_gq = {t: np.zeros((m, n)) for t in gq_thresholds}
    lens = np.zeros(m)
    for ii, iv in enumerate(ivs):
        s_ = iv.start.global_position()
        e_ = iv.end.global_position()
        lens[ii] = max(e_ - s_, 1)
        overlap = np.maximum(0, np.minimum(end_gp, e_) - np.maximum(gp, s_) + 1)
        rows = np.where(overlap > 0)[0]
        for r in rows:
            ov = overlap[r]
            d = defined[r]
            bases_cov[ii] += np.where(d, ov, 0)
            if dpv is not None:
                dprow = np.where(dpm[r], 0, dpv[r]) if dpm is not None else dpv[r]
                dp_sum[ii] += np.where(d, ov * dprow, 0)
                for t in dp_thresholds:
                    frac_dp[t][ii] += np.where(d & (dprow >= t), ov, 0)
            if gqv is not None:
                for t in gq_thresholds:
                    frac_gq[t][ii] += np.where(d & (gqv[r] >= t), ov, 0)
    rows_b = Batch({'interval': C.from_pylist(
        ht.tinterval(rst.row_type['locus']), ivs)}, m)
    ents = {
        'bases_over_dp_threshold': None,
        'fraction_over_dp_threshold': None,
    }
    ents = {}
    ents['bases_covered'] = PrimitiveColumn(ht.tint64, bases_cov.astype(np.int64))
    with np.errstate(all='ignore'):
        mean_dp = np.where(bases_cov > 0, dp_sum / np.maximum(bases_cov, 1), 0.0)
        ents['mean_dp'] = PrimitiveColumn(ht.tfloat64, mean_dp)
        for t in dp_thresholds:
            ents[f'fraction_over_dp_{t}'] = PrimitiveColumn(
                ht.tfloat64, frac_dp[t] / lens[:, None])
        for t in gq_thresholds:
            ents[f'fraction_over_gq_{t}'] = PrimitiveColumn(
                ht.tfloat64, frac_gq[t] / lens[:, None])
    from .. import ir
    from ..ir import columns as C2
    entry_t = ht.tstruct(**{k: (ht.tint64 if k == 'bases_covered' else ht.tfloat64)
                            for k in ents})
    return MatrixTable(MatrixStage.from_batches(
        Batch({}, 1), rst.cols, ['interval'], rst.col_key,
        ht.tstruct(interval=ht.tinterval(rst.row_type['locus'])), rst.col_type,
        entry_t, [MatrixBatch(rows_b, ents)]))


def impute_sex_chromosome_ploidy(vds, calling_intervals, normalization_contig: str,
                                 use_variant_dataset: bool = False):
    """X/Y ploidy estimates from mean reference-block DP vs an autosomal
    normalization contig (reference vds.impute_sex_chromosome_ploidy)."""
    from ..ir.columns import Batch
    from ..table import Table, TableStage
    gp, end_gp, defined, dp_col, rmb = _ref_block_arrays(vds)
    rst = vds.reference_data._stage
    rg = rst.row_type['locus'].reference_genome
    n = rst.n_cols
    if dp_col is None:
        raise ValueError('impute_sex_chromosome_ploidy requires a DP entry field')
    dpv = np.asarray(dp_col.values, dtype=np.float64)
    contigs = np.asarray(rmb.rows.columns['locus'].contig_idx)
    lengths = (end_gp - gp + 1).astype(np.float64)

    def mean_dp_for(contig_names):
        idxs = [rg.contig_index(c2) for c2 in contig_names if rg.has_contig(c2)]
        sel = np.isin(contigs, idxs)
        if not sel.any():
            return np.zeros(n), np.zeros(n)
        w = lengths[sel][:, None] * defined[sel]
        tot = (w * dpv[sel]).sum(axis=0)
        cov = w.sum(axis=0)
        with np.errstate(all='ignore'):
            return np.where(cov > 0, tot / np.maximum(cov, 1), 0.0), cov

    norm_mean, _ = mean_dp_for([normalization_contig])
    x_mean, _ = mean_dp_for(rg.x_contigs)
    y_mean, _ = mean_dp_for(rg.y_contigs)
    with np.errstate(all='ignore'):
        x_ploidy = np.where(norm_mean > 0, 2 * x_mean / np.maximum(norm_mean, 1e-300), 0.0)
        y_ploidy = np.where(norm_mean > 0, 2 * y_mean / np.maximum(norm_mean, 1e-300), 0.0)
    skey = rst.col_key[0]
    samples = [r[skey] for r in rst.cols.to_pylist()]
    row_t = ht.tstruct(s=ht.tstr, autosomal_mean_dp=ht.tfloat64,
                       x_mean_dp=ht.tfloat64, x_ploidy=ht.tfloat64,
                       y_mean_dp=ht.tfloat64, y_ploidy=ht.tfloat64)
    from ..utils.structs import Struct
    rows = [Struct(s=samples[i], autosomal_mean_dp=float(norm_mean[i]),
                   x_mean_dp=float(x_mean[i]), x_ploidy=float(x_ploidy[i]),
                   y_mean_dp=float(y_mean[i]), y_ploidy=float(y_ploidy[i]))
            for i in range(n)]
    return Table(TableStage.from_batches(Batch({}, 1), ['s'], row_t,
                                         [Batch.from_pylist(row_t, rows)]))


def truncate_reference_blocks(vds, *, max_ref_block_base_pairs=None,
                              ref_block_winsorize_fraction=None):
    """Split reference blocks longer than max_ref_block_base_pairs
    (reference vds.truncate_reference_blocks)."""
    from ..genetics.locus import Locus
    from ..ir.columns import Batch
    from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable, _concat_matrix_batches
    if max_ref_block_base_pairs is None:
        return vds
    rst = vds.reference_data._stage
    rmb = _concat_matrix_batches(rst.collect_batches(), rst)
    loc = rmb.rows.columns['locus']
    pos = np.asarray(loc.position, dtype=np.int64)
    endf = rmb.rows.columns.get('__END')
    if endf is None:
        return vds
    ends = np.asarray(endf.values, dtype=np.int64)
    span = ends - pos + 1
    n_pieces = np.maximum(1, np.ceil(span / max_ref_block_base_pairs)).astype(np.int64)
    src, new_pos, new_end = [], [], []
    for i in range(rmb.n_rows):
        for p2 in range(int(n_pieces[i])):
            s2 = pos[i] + p2 * max_ref_block_base_pairs
            e2 = min(ends[i], s2 + max_ref_block_base_pairs - 1)
            src.append(i)
            new_pos.append(s2)
            new_end.append(e2)
    idx = np.asarray(src, dtype=np.int64)
    from ..ir.columns import LocusColumn, PrimitiveColumn
    cols = {}
    for k, c2 in rmb.rows.columns.items():
        if k == 'locus':
            cols[k] = LocusColumn(c2.typ, np.asarray(loc.contig_idx)[idx],
                                  np.asarray(new_pos, dtype=np.int32))
        elif k == '__END':
            cols[k] = PrimitiveColumn(ht.tint32, np.asarray(new_end, dtype=np.int32))
        else:
            cols[k] = c2.gather(idx)
    rows = Batch(cols, len(idx))
    ents = {k: c2.gather(idx, axis=0) for k, c2 in rmb.entries.items()}
    new_ref = MatrixTable(MatrixStage.from_batches(
        rst.globals, rst.cols, rst.row_key, rst.col_key, rst.row_type,
        rst.col_type, rst.entry_type, [MatrixBatch(rows, ents)]))
    return VariantDataset(new_ref, vds.variant_data)


def new_combiner(**kwargs):
    from .combiner import new_combiner as nc
    return nc(**kwargs)


def load_combiner(path: str):
    from .combiner import load_combiner as lc
    return lc(path)
