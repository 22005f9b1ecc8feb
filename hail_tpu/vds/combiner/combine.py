"""GVCF/VDS merge primitives (reference `hail/vds/combiner/combine.py`):
transform a single-sample GVCF into a VDS, parse allele-specific INFO
fields, and union samples across VDSes."""

from __future__ import annotations

from typing import List, Optional, Set

import numpy as np

from ... import types as ht
from ...ir import columns as C
from ...ir.columns import Batch
from ...matrixtable import (MatrixBatch, MatrixStage, MatrixTable,
                            _concat_matrix_batches)
from ...utils.structs import Struct
from .. import VariantDataset


def make_ref_entry_struct(e, entry_to_keep, save_filters, row):
    """Reference-block entry: localize GT/PGT/AD/PL, add LEN from END
    (reference `combine.py:84` make_ref_entry_struct)."""
    from ...expr import functions as F
    handled = {}
    handled_names = {'AD', 'GT', 'PGT', 'PL'}
    if 'GT' in entry_to_keep:
        handled['LGT'] = e['GT']
    if 'PGT' in entry_to_keep:
        handled['LPGT'] = e['PGT']
    if 'AD' in entry_to_keep:
        handled['LAD'] = e['AD'][:1]
    if 'PL' in entry_to_keep:
        handled['LPL'] = e['PL'][:1]
    passthrough = {k: v for k, v in e.items()
                   if k in entry_to_keep and k not in handled_names}
    filters = {'gvcf_filters': row.filters} if save_filters else {}
    return (
        F.case()
        .when(F.coalesce(e.GT.is_hom_ref(), True),
              F.struct(**passthrough, **handled,
                       LEN=row.info.END - row.locus.position + 1, **filters))
        .or_error('found reference block with non reference-genotype at '
                  + F.str_(row.locus))
    )


def defined_entry_fields(mt: MatrixTable, sample: Optional[int] = None) -> Set[str]:
    """Entry fields with at least one defined value (reference
    `combine.py:143` defined_entry_fields)."""
    from ...expr import aggregators as agg
    from ...expr import functions as F
    if sample is not None:
        mt = mt.head(sample)
    used = mt.aggregate_entries(F.struct(**{
        k: agg.any(F.is_defined(v)) for k, v in mt.entry.items()}))
    return {k for k in mt.entry if used[k]}


def parse_allele_specific_ints(string, has_non_ref):
    from ...expr import functions as F
    parts = string.split(r'\|')
    parts = F.if_else(has_non_ref, parts[:-1], parts)
    return parts.map(lambda i: F.if_else((F.len_(i) == 0) | (i == '.'),
                                         F.missing(ht.tint32), F.int32(i)))


def parse_allele_specific_doubles(string, has_non_ref):
    from ...expr import functions as F
    parts = string.split(r'\|')
    parts = F.if_else(has_non_ref, parts[:-1], parts)
    return parts.map(lambda i: F.if_else((F.len_(i) == 0) | (i == '.'),
                                         F.missing(ht.tfloat64), F.float64(i)))


def parse_allele_specific_sb_table(string, has_non_ref):
    from ...expr import functions as F
    parts = string.split(r'\|')
    parts = F.if_else(has_non_ref, parts[:-1], parts)
    return parts.map(lambda xs: xs.split(',').map(F.int32))


def parse_allele_specific_ranksum(string, has_non_ref):
    from ...expr import functions as F
    typ = ht.ttuple(ht.tfloat64, ht.tint32)
    parts = string.split(r'\|')
    parts = F.if_else(has_non_ref, parts[:-1], parts)
    return parts.map(
        lambda s: F.if_else(
            (F.len_(s) == 0) | (s == '.'),
            F.missing(typ),
            F.rbind(
                s.split(','),
                lambda ss: F.if_else(
                    F.len_(ss) != 2,   # malformed (e.g. 'NaN') → missing
                    F.missing(typ),
                    F.tuple([F.float64(ss[0]), F.int32(ss[1])])))))


_allele_specific_field_parsers = {
    'AS_QUALapprox': parse_allele_specific_ints,
    'AS_RAW_MQ': parse_allele_specific_doubles,
    'AS_RAW_MQRankSum': parse_allele_specific_ranksum,
    'AS_RAW_ReadPosRankSum': parse_allele_specific_ranksum,
    'AS_SB_TABLE': parse_allele_specific_sb_table,
    'AS_VarDP': parse_allele_specific_ints,
}


def parse_allele_specific_fields(info, has_non_ref):
    """Parse pipe-delimited AS_* INFO strings into typed arrays, trimming the
    <NON_REF> slot (reference `combine.py:405`)."""
    from ...expr import functions as F

    def parse_field(field):
        parse = _allele_specific_field_parsers.get(field)
        if parse:
            return parse(info[field], has_non_ref)
        return info[field]

    return F.struct(**{f: parse_field(f) for f in info})


def transform_gvcf(mt: MatrixTable, reference_entry_fields_to_keep=(),
                   info_to_keep=None) -> VariantDataset:
    """Split an imported GVCF into (reference_data, variant_data)
    (reference `vds/combiner/combine.py` transform_gvcf)."""
    from ...expr import functions as F
    has_end = ('info' in mt._stage.row_type.fields
               and 'END' in mt._stage.row_type['info'].fields)
    if has_end:
        ref = mt.filter_rows(F.is_defined(mt.info.END))
        var = mt.filter_rows(F.is_defined(mt.info.END), keep=False)
        ref = ref.annotate_rows(__END=ref.info.END)
    else:
        ref = mt.filter_rows(F.literal(False))
        var = mt
        ref = ref.annotate_rows(__END=F.missing(ht.tint32))
    # drop <NON_REF> from variant alleles
    var = var.annotate_rows(alleles=var.alleles.filter(lambda a: a != '<NON_REF>'))
    return VariantDataset(ref, var)


def combine_references(mts: List[MatrixTable]) -> MatrixTable:
    """Union samples across reference-data MatrixTables; the
    ref_block_max_length global survives only if every input carries it
    (as the max), mirroring reference `combine.py:324`."""
    from ...expr import functions as F
    fd = VariantDataset.ref_block_max_length_field
    have = [mt for mt in mts if fd in mt.globals]
    if have and len(have) < len(mts):
        mts = [mt.drop(fd) if fd in mt.globals else mt for mt in mts]
        have = []
    mts = [mt.drop('ref_allele') if 'ref_allele' in mt.row else mt for mt in mts]
    out = _outer_union_cols(mts)
    if have:
        max_len = max(mt.globals[fd].collect()[0] if hasattr(mt.globals[fd], 'collect')
                      else F.eval_expr(mt.globals[fd]) for mt in mts)
        out = out.annotate_globals(**{fd: max_len})
    return out


def combine_variant_datasets(vdses: List[VariantDataset]) -> VariantDataset:
    """Union samples across VDSes (reference combine.py
    combine_variant_datasets)."""
    refs = [v.reference_data for v in vdses]
    vars_ = [v.variant_data for v in vdses]
    return VariantDataset(combine_references(refs), _outer_union_cols(vars_))


def _hashable(kt):
    return tuple(tuple(v) if isinstance(v, list) else v for v in kt)


def _outer_union_cols(mts: List[MatrixTable]) -> MatrixTable:
    """Full outer union of columns: rows = union of row keys; entries missing
    where a dataset lacks the row."""
    if len(mts) == 1:
        return mts[0]
    from ...table import _key_tuples
    st0 = mts[0]._stage
    mbs = [_concat_matrix_batches(mt._stage.collect_batches(), mt._stage) for mt in mts]
    key_fields = st0.row_key
    all_keys = {}
    for mb, mt in zip(mbs, mts):
        for i, kt in enumerate(_key_tuples(mb.rows, key_fields)):
            kt = _hashable(kt)
            if kt not in all_keys:
                all_keys[kt] = (mb, i)
    # sort union keys by locus global position where applicable
    def sort_key(kt):
        out = []
        for v in kt:
            if hasattr(v, 'global_position'):
                out.append(v.global_position())
            elif isinstance(v, list):
                out.append(tuple(str(x) for x in v))
            else:
                out.append(v)
        return tuple(out)
    union_keys = sorted(all_keys.keys(), key=sort_key)
    key_index = {kt: i for i, kt in enumerate(union_keys)}
    R = len(union_keys)
    # row fields taken from the first dataset containing the key
    row_vals = []
    for kt in union_keys:
        mb, i = all_keys[kt]
        row_vals.append(Struct(**{f: mb.rows.columns[f].to_pylist()[i]
                                  for f in st0.row_type.fields}))
    rows = Batch.from_pylist(st0.row_type, row_vals)
    # entries: per dataset gather into union rows
    ent_cols = {}
    for field, ftype in st0.entry_type.fields.items():
        pieces = []
        for mb, mt in zip(mbs, mts):
            kts = [_hashable(k) for k in _key_tuples(mb.rows, key_fields)]
            src_idx = np.full(R, 0, dtype=np.int64)
            present = np.zeros(R, dtype=bool)
            for i, kt in enumerate(kts):
                j = key_index[kt]
                src_idx[j] = i
                present[j] = True
            col = mb.entries[field].gather(src_idx, axis=0)
            miss_rows = ~present
            if miss_rows.any():
                col = col.with_missing(np.broadcast_to(miss_rows[:, None],
                                                       (R, mt._stage.n_cols)).copy())
            pieces.append(col)
        ent_cols[field] = C.concat_columns(pieces, axis=1)
    cols = Batch.concat([mt._stage.cols for mt in mts])
    return MatrixTable(MatrixStage.from_batches(
        st0.globals, cols, st0.row_key, st0.col_key, st0.row_type,
        st0.col_type, st0.entry_type, [MatrixBatch(rows, ent_cols)]))
