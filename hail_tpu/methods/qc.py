"""variant_qc / sample_qc.

Capability parity with reference `hail/python/hail/methods/qc.py`
(`variant_qc`, `sample_qc`). variant_qc composes the vectorized aggregator
tier; sample_qc runs a dedicated numpy kernel per partition (per-sample
allele-type counting needs row-allele metadata crossed with entries, which is
a take_along_axis lookup here instead of the reference's per-genotype
virtual-function loop).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import types as ht
from ..context import Env
from ..expr import aggregators as agg
from ..expr import functions as F
from importlib import import_module as _imp
at = _imp("hail_tpu.genetics.allele_type")
from ..genetics.call import (PLOIDY_MASK, calls_allele_j, calls_allele_k,
                             calls_is_het, calls_is_hom_ref, calls_is_hom_var)
from ..ir import columns as C
from ..ir.columns import Batch, PrimitiveColumn, StructColumn
from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable


def variant_qc(mt: MatrixTable, name: str = 'variant_qc') -> MatrixTable:
    """Compute per-variant QC metrics (reference `methods/qc.py` variant_qc)."""
    if 'GT' not in mt._stage.entry_type.fields:
        raise ValueError('variant_qc requires a GT entry field')
    gt = mt.GT
    has_dp = 'DP' in mt._stage.entry_type.fields
    has_gq = 'GQ' in mt._stage.entry_type.fields
    n_cols = mt.count_cols()

    exprs = dict(
        call_stats=agg.call_stats(gt, mt.alleles),
        n_called=agg.count_where(F.is_defined(gt)),
        n_het=agg.count_where(gt.is_het()),
        n_non_ref=agg.count_where(gt.is_non_ref()),
        hwe=agg.hardy_weinberg_test(gt),
    )
    if has_dp:
        exprs['dp_stats'] = agg.stats(mt.DP)
    if has_gq:
        exprs['gq_stats'] = agg.stats(mt.GQ)

    mt = mt.annotate_rows(__qc_tmp=F.struct(**exprs))
    t = mt.__qc_tmp
    result = dict(
        AC=t.call_stats.AC,
        AF=t.call_stats.AF,
        AN=t.call_stats.AN,
        homozygote_count=t.call_stats.homozygote_count,
        call_rate=F.float64(t.n_called) / n_cols,
        n_called=t.n_called,
        n_not_called=n_cols - t.n_called,
        n_filtered=F.literal(0, ht.tint64),
        n_het=t.n_het,
        n_non_ref=t.n_non_ref,
        het_freq_hwe=t.hwe.het_freq_hwe,
        p_value_hwe=t.hwe.p_value,
    )
    if has_dp:
        result['dp_stats'] = t.dp_stats
    if has_gq:
        result['gq_stats'] = t.gq_stats
    mt = mt.annotate_rows(**{name: F.struct(**result)})
    return mt.drop('__qc_tmp')


_SAMPLE_QC_T = ht.tstruct(
    dp_stats=ht.tstruct(mean=ht.tfloat64, stdev=ht.tfloat64, min=ht.tfloat64, max=ht.tfloat64),
    gq_stats=ht.tstruct(mean=ht.tfloat64, stdev=ht.tfloat64, min=ht.tfloat64, max=ht.tfloat64),
    call_rate=ht.tfloat64,
    n_called=ht.tint64, n_not_called=ht.tint64, n_filtered=ht.tint64,
    n_hom_ref=ht.tint64, n_het=ht.tint64, n_hom_var=ht.tint64, n_non_ref=ht.tint64,
    n_singleton=ht.tint64, n_snp=ht.tint64, n_insertion=ht.tint64,
    n_deletion=ht.tint64, n_transition=ht.tint64, n_transversion=ht.tint64,
    n_star=ht.tint64, r_ti_tv=ht.tfloat64, r_het_hom_var=ht.tfloat64,
    r_insertion_deletion=ht.tfloat64,
)

# allele-type codes used in the kernel
_AT_SNP, _AT_INS, _AT_DEL, _AT_STAR, _AT_TI, _AT_TV = 1, 2, 3, 4, 5, 6


def _row_allele_codes(alleles_list) -> np.ndarray:
    """(R, max_alleles) int8 codes; column 0 (ref) is 0."""
    R = len(alleles_list)
    A = max((len(a) for a in alleles_list if a is not None), default=1)
    codes = np.zeros((R, max(A, 1)), dtype=np.int8)
    ti_tv = np.zeros((R, max(A, 1)), dtype=np.int8)
    for i, als in enumerate(alleles_list):
        if als is None:
            continue
        ref = als[0]
        for a_i in range(1, len(als)):
            t = at.allele_type(ref, als[a_i])
            if t == at.AlleleType.SNP:
                codes[i, a_i] = _AT_SNP
                ti_tv[i, a_i] = _AT_TI if at.is_transition(ref, als[a_i]) else _AT_TV
            elif t == at.AlleleType.INSERTION:
                codes[i, a_i] = _AT_INS
            elif t == at.AlleleType.DELETION:
                codes[i, a_i] = _AT_DEL
            elif t == at.AlleleType.STAR:
                codes[i, a_i] = _AT_STAR
    return codes, ti_tv


def sample_qc(mt: MatrixTable, name: str = 'sample_qc') -> MatrixTable:
    """Compute per-sample QC metrics (reference `methods/qc.py` sample_qc)."""
    st = mt._stage
    if 'GT' not in st.entry_type.fields:
        raise ValueError('sample_qc requires a GT entry field')
    n_cols = st.n_cols
    has_dp = 'DP' in st.entry_type.fields
    has_gq = 'GQ' in st.entry_type.fields

    def part_stats(ctx):
        mb = st.partition_fn(ctx)
        gt_col = mb.entries['GT']
        packed = np.asarray(gt_col.values)
        miss = gt_col.missing_mask()
        called = ~miss
        R = mb.n_rows
        ploidy = packed & PLOIDY_MASK
        j = calls_allele_j(packed)
        k = calls_allele_k(packed)

        out = {}
        out['n_called'] = called.sum(axis=0).astype(np.int64)
        out['n_rows'] = np.int64(R)
        out['n_hom_ref'] = (called & calls_is_hom_ref(packed)).sum(axis=0).astype(np.int64)
        out['n_het'] = (called & calls_is_het(packed)).sum(axis=0).astype(np.int64)
        out['n_hom_var'] = (called & calls_is_hom_var(packed)).sum(axis=0).astype(np.int64)

        alleles_list = mb.rows.columns['alleles'].to_pylist()
        codes, ti_tv = _row_allele_codes(alleles_list)
        A = codes.shape[1]
        jc = np.clip(j, 0, A - 1)
        kc = np.clip(k, 0, A - 1)
        code_j = np.take_along_axis(codes, jc, axis=1)
        code_k = np.take_along_axis(codes, kc, axis=1)
        titv_j = np.take_along_axis(ti_tv, jc, axis=1)
        titv_k = np.take_along_axis(ti_tv, kc, axis=1)
        use_j = called & (ploidy >= 1) & (j > 0)
        use_k = called & (ploidy == 2) & (k > 0)
        for cname, code in [('n_snp', _AT_SNP), ('n_insertion', _AT_INS),
                            ('n_deletion', _AT_DEL), ('n_star', _AT_STAR)]:
            out[cname] = ((use_j & (code_j == code)).sum(axis=0)
                          + (use_k & (code_k == code)).sum(axis=0)).astype(np.int64)
        out['n_transition'] = ((use_j & (titv_j == _AT_TI)).sum(axis=0)
                               + (use_k & (titv_k == _AT_TI)).sum(axis=0)).astype(np.int64)
        out['n_transversion'] = ((use_j & (titv_j == _AT_TV)).sum(axis=0)
                                 + (use_k & (titv_k == _AT_TV)).sum(axis=0)).astype(np.int64)

        # singletons: allele (r, a>0) with total AC == 1, carried by this sample
        n_alleles_max = A
        ac = np.zeros((R, n_alleles_max), dtype=np.int64)
        rr = np.arange(R)[:, None]
        np.add.at(ac, (np.broadcast_to(rr, jc.shape)[use_j], jc[use_j]), 1)
        np.add.at(ac, (np.broadcast_to(rr, kc.shape)[use_k], kc[use_k]), 1)
        ac_j = np.take_along_axis(ac, jc, axis=1)
        ac_k = np.take_along_axis(ac, kc, axis=1)
        single_j = use_j & (ac_j == 1)
        single_k = use_k & (ac_k == 1)
        # a hom-var singleton would be AC==2, so no double count issue; but a
        # het carrying the same allele twice can't happen (j != k for het)
        out['n_singleton'] = (single_j.sum(axis=0) + single_k.sum(axis=0)).astype(np.int64)

        for fname, flag in [('dp', has_dp), ('gq', has_gq)]:
            if not flag:
                continue
            col = mb.entries[fname.upper()]
            v = np.asarray(col.values, dtype=np.float64)
            m = col.missing_mask()
            ok = ~m
            out[f'{fname}_sum'] = np.where(ok, v, 0).sum(axis=0)
            out[f'{fname}_sumsq'] = np.where(ok, v * v, 0).sum(axis=0)
            out[f'{fname}_n'] = ok.sum(axis=0).astype(np.int64)
            out[f'{fname}_min'] = np.where(ok, v, np.inf).min(axis=0) if R else np.full(v.shape[1], np.inf)
            out[f'{fname}_max'] = np.where(ok, v, -np.inf).max(axis=0) if R else np.full(v.shape[1], -np.inf)
        return out

    partials = Env.backend().map_collect(st.contexts, part_stats)
    total = partials[0]
    for p in partials[1:]:
        for key in p:
            if key.endswith('_min'):
                total[key] = np.minimum(total[key], p[key])
            elif key.endswith('_max'):
                total[key] = np.maximum(total[key], p[key])
            else:
                total[key] = total[key] + p[key]

    n_rows = int(total['n_rows'])
    with np.errstate(all='ignore'):
        def stat_struct(prefix):
            if f'{prefix}_n' not in total:
                return None
            n = total[f'{prefix}_n']
            mean = total[f'{prefix}_sum'] / n
            var = total[f'{prefix}_sumsq'] / n - mean * mean
            miss = n == 0
            t = _SAMPLE_QC_T[f'{prefix}_stats']
            m = miss if miss.any() else None
            return StructColumn(t, {
                'mean': PrimitiveColumn(ht.tfloat64, np.where(miss, 0.0, mean), m),
                'stdev': PrimitiveColumn(ht.tfloat64, np.where(miss, 0.0, np.sqrt(np.maximum(var, 0))), m),
                'min': PrimitiveColumn(ht.tfloat64, np.where(miss, 0.0, total[f'{prefix}_min']), m),
                'max': PrimitiveColumn(ht.tfloat64, np.where(miss, 0.0, total[f'{prefix}_max']), m),
            }, None, (n_cols,))

        call_rate = total['n_called'] / n_rows if n_rows else np.zeros(n_cols)
        ti, tv = total['n_transition'], total['n_transversion']
        het, homv = total['n_het'], total['n_hom_var']
        ins, dele = total['n_insertion'], total['n_deletion']

        def ratio(a, b):
            r = a / b
            miss = b == 0
            return PrimitiveColumn(ht.tfloat64, np.where(miss, 0.0, r), miss if miss.any() else None)

        fields = {}
        ds = stat_struct('dp')
        gs = stat_struct('gq')
        if ds is not None:
            fields['dp_stats'] = ds
        if gs is not None:
            fields['gq_stats'] = gs
        fields.update({
            'call_rate': PrimitiveColumn(ht.tfloat64, call_rate),
            'n_called': PrimitiveColumn(ht.tint64, total['n_called']),
            'n_not_called': PrimitiveColumn(ht.tint64, n_rows - total['n_called']),
            'n_filtered': PrimitiveColumn(ht.tint64, np.zeros(n_cols, np.int64)),
            'n_hom_ref': PrimitiveColumn(ht.tint64, total['n_hom_ref']),
            'n_het': PrimitiveColumn(ht.tint64, het),
            'n_hom_var': PrimitiveColumn(ht.tint64, homv),
            'n_non_ref': PrimitiveColumn(ht.tint64, het + homv),
            'n_singleton': PrimitiveColumn(ht.tint64, total['n_singleton']),
            'n_snp': PrimitiveColumn(ht.tint64, total['n_snp']),
            'n_insertion': PrimitiveColumn(ht.tint64, ins),
            'n_deletion': PrimitiveColumn(ht.tint64, dele),
            'n_transition': PrimitiveColumn(ht.tint64, ti),
            'n_transversion': PrimitiveColumn(ht.tint64, tv),
            'n_star': PrimitiveColumn(ht.tint64, total['n_star']),
            'r_ti_tv': ratio(ti, tv),
            'r_het_hom_var': ratio(het, homv),
            'r_insertion_deletion': ratio(ins, dele),
        })

    out_t = ht.tstruct(**{k: c.typ for k, c in fields.items()})
    qc_col = StructColumn(out_t, fields, None, (n_cols,))
    cb = st.cols.annotate(**{name: qc_col})
    return MatrixTable(MatrixStage(st.globals, cb, st.row_key, st.col_key,
                                   st.row_type, cb.row_type, st.entry_type,
                                   st.contexts, st.partition_fn))
