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

from .. import read_vds
from .combine import combine_variant_datasets, transform_gvcf

VDS_VERSION = 1


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
        from ...fs import local_path
        self.save_path = local_path(self.save_path)
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
        from ...fs import local_path
        path = local_path(path)
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
        from ...io.vcf import import_vcf
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
