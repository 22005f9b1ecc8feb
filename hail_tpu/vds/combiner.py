"""VariantDatasetCombiner: hierarchical GVCF/VDS merging.

Capability parity with reference
`hail/python/hail/vds/combiner/variant_dataset_combiner.py:67,180-181`
(branch_factor=100, gvcf_batch_size=50 defaults; checkpointed, resumable
plan). GVCFs are transformed to VDSes (reference-block rows split from
variant rows), merged in batches of `branch_factor`, with the plan JSON
saved after every step so a crashed run resumes where it left off.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Dict, List, Optional

import numpy as np

from .. import types as ht
from ..ir import columns as C
from ..ir.columns import Batch, ObjectColumn, PrimitiveColumn
from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable, _concat_matrix_batches
from ..utils.structs import Struct
from . import VariantDataset, read_vds

VDS_VERSION = 1


def transform_gvcf(mt: MatrixTable, reference_entry_fields_to_keep=(),
                   info_to_keep=None) -> VariantDataset:
    """Split an imported GVCF into (reference_data, variant_data)
    (reference `vds/combiner/combine.py` transform_gvcf)."""
    from ..expr import functions as F
    # reference-block rows: single alt <NON_REF> and INFO END present
    def is_ref_block(m):
        al = m.alleles
        return (F.len_(al) <= 2) & F.coalesce(al[1] == '<NON_REF>', True) \
            & F.is_defined(m.info.END) if 'END' in m._stage.row_type['info'].fields \
            else F.literal(False)
    has_end = 'info' in mt._stage.row_type.fields and 'END' in mt._stage.row_type['info'].fields
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


def combine_variant_datasets(vdses: List[VariantDataset]) -> VariantDataset:
    """Union samples across VDSes (reference combine.py combine_vds)."""
    refs = [v.reference_data for v in vdses]
    vars_ = [v.variant_data for v in vdses]
    return VariantDataset(_outer_union_cols(refs), _outer_union_cols(vars_))


def _hashable(kt):
    return tuple(tuple(v) if isinstance(v, list) else v for v in kt)


def _outer_union_cols(mts: List[MatrixTable]) -> MatrixTable:
    """Full outer union of columns: rows = union of row keys; entries missing
    where a dataset lacks the row."""
    if len(mts) == 1:
        return mts[0]
    from ..table import _key_tuples
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
    total_cols = sum(mt._stage.n_cols for mt in mts)
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


class VariantDatasetCombiner:
    """Checkpointed, resumable combiner plan (reference
    `variant_dataset_combiner.py:67`)."""

    default_branch_factor = 100
    default_gvcf_batch_size = 50

    def __init__(self, save_path: str, output_path: str, temp_path: str,
                 reference_genome='default',
                 gvcf_paths: Optional[List[str]] = None,
                 vds_paths: Optional[List[str]] = None,
                 gvcf_sample_names: Optional[List[str]] = None,
                 branch_factor: int = default_branch_factor,
                 target_records: int = 30000,
                 gvcf_batch_size: int = default_gvcf_batch_size,
                 contig_recoding: Optional[Dict[str, str]] = None):
        self.save_path = save_path
        self.output_path = output_path
        self.temp_path = temp_path
        self.reference_genome = reference_genome if isinstance(reference_genome, str) else reference_genome.name
        self.gvcf_paths = list(gvcf_paths or [])
        self.vds_paths = list(vds_paths or [])
        self.gvcf_sample_names = gvcf_sample_names
        self.branch_factor = branch_factor
        self.gvcf_batch_size = gvcf_batch_size
        self.contig_recoding = contig_recoding
        self._finished = False

    # -- plan persistence --------------------------------------------------
    def save(self) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.save_path)) or '.', exist_ok=True)
        with open(self.save_path, 'w') as f:
            json.dump({
                'version': VDS_VERSION,
                'output_path': self.output_path,
                'temp_path': self.temp_path,
                'reference_genome': self.reference_genome,
                'gvcf_paths': self.gvcf_paths,
                'vds_paths': self.vds_paths,
                'branch_factor': self.branch_factor,
                'gvcf_batch_size': self.gvcf_batch_size,
                'finished': self._finished,
            }, f)

    @staticmethod
    def load(path: str) -> 'VariantDatasetCombiner':
        with open(path) as f:
            d = json.load(f)
        c = VariantDatasetCombiner(
            path, d['output_path'], d['temp_path'], d['reference_genome'],
            d['gvcf_paths'], d['vds_paths'],
            branch_factor=d.get('branch_factor', 100),
            gvcf_batch_size=d.get('gvcf_batch_size', 50))
        c._finished = d.get('finished', False)
        return c

    @property
    def finished(self) -> bool:
        return self._finished

    # -- execution ---------------------------------------------------------
    def run(self) -> None:
        from ..io.vcf import import_vcf
        while self.gvcf_paths:
            batch = self.gvcf_paths[:self.gvcf_batch_size]
            vdses = []
            for p in batch:
                mt = import_vcf(p, reference_genome=self.reference_genome,
                                contig_recoding=self.contig_recoding)
                vdses.append(transform_gvcf(mt))
            merged = combine_variant_datasets(vdses)
            tmp = os.path.join(self.temp_path, f'combine_{uuid.uuid4().hex[:8]}.vds')
            merged.write(tmp, overwrite=True)
            self.vds_paths.append(tmp)
            self.gvcf_paths = self.gvcf_paths[len(batch):]
            self.save()
        while len(self.vds_paths) > 1:
            batch = self.vds_paths[:self.branch_factor]
            vdses = [read_vds(p) for p in batch]
            merged = combine_variant_datasets(vdses)
            tmp = os.path.join(self.temp_path, f'combine_{uuid.uuid4().hex[:8]}.vds')
            merged.write(tmp, overwrite=True)
            self.vds_paths = [tmp] + self.vds_paths[len(batch):]
            self.save()
        if self.vds_paths:
            final = read_vds(self.vds_paths[0])
            final.write(self.output_path, overwrite=True)
        self._finished = True
        self.save()


def new_combiner(*, output_path: str, temp_path: str,
                 save_path: Optional[str] = None,
                 gvcf_paths: Optional[List[str]] = None,
                 vds_paths: Optional[List[str]] = None,
                 gvcf_sample_names: Optional[List[str]] = None,
                 branch_factor: int = VariantDatasetCombiner.default_branch_factor,
                 target_records: int = 30000,
                 gvcf_batch_size: int = VariantDatasetCombiner.default_gvcf_batch_size,
                 reference_genome='default', use_exome_default_intervals=False,
                 use_genome_default_intervals=False, contig_recoding=None,
                 force: bool = False, **kwargs) -> VariantDatasetCombiner:
    if save_path is None:
        save_path = os.path.join(temp_path, 'combiner_plan.json')
    if os.path.exists(save_path) and not force:
        c = VariantDatasetCombiner.load(save_path)
        if not c.finished:
            return c
    c = VariantDatasetCombiner(save_path, output_path, temp_path,
                               reference_genome, gvcf_paths, vds_paths,
                               gvcf_sample_names, branch_factor, target_records,
                               gvcf_batch_size, contig_recoding)
    c.save()
    return c


def load_combiner(path: str) -> VariantDatasetCombiner:
    return VariantDatasetCombiner.load(path)
