import os

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import types as ht

SAMPLE_VCF = '/root/reference/hail/hail/test/resources/sample.vcf'


def test_import_vcf_dims(sample_mt):
    # known fixture shape: 346 variants x 100 samples (reference sample.vcf)
    assert sample_mt.count() == (346, 100)
    assert sample_mt._stage.row_key == ['locus', 'alleles']
    et = sample_mt._stage.entry_type
    assert et['GT'] == ht.tcall
    assert et['AD'] == ht.tarray(ht.tint32)
    assert et['DP'] == ht.tint32


def test_import_vcf_values(sample_mt):
    rows = sample_mt.rows().take(1)
    r = rows[0]
    assert r.locus.contig == '20'
    assert len(r.alleles) >= 2
    e = sample_mt.entries().take(1)[0]
    assert e.GT is None or e.GT.ploidy == 2


def test_variant_qc_on_vcf(sample_mt):
    mt = hl.variant_qc(sample_mt)
    rows = mt.rows().take(5)
    for r in rows:
        q = r.variant_qc
        assert 0 <= q.call_rate <= 1
        assert q.AN == 2 * q.n_called
        assert abs(sum(q.AF) - 1.0) < 1e-9 or q.AN == 0
        assert sum(q.AC) == q.AN
        assert 0 <= q.p_value_hwe <= 1


def test_sample_qc_on_vcf(sample_mt):
    mt = hl.sample_qc(sample_mt)
    cols = mt.cols().take(5)
    for c in cols:
        q = c.sample_qc
        assert 0 <= q.call_rate <= 1
        assert q.n_called + q.n_not_called == 346
        assert q.n_het + q.n_hom_var == q.n_non_ref


def test_export_import_roundtrip(tmp_path, sample_mt):
    out = str(tmp_path / 'out.vcf')
    mt = sample_mt.head(20)
    hl.export_vcf(mt, out)
    mt2 = hl.import_vcf(out)
    assert mt2.count() == (20, 100)
    g1 = mt.entries().take(50)
    g2 = mt2.entries().take(50)
    for a, b in zip(g1, g2):
        assert a.GT == b.GT
        assert a.DP == b.DP


def test_get_vcf_metadata():
    md = hl.get_vcf_metadata(SAMPLE_VCF)
    assert 'GT' in md['format']
    assert md['format']['GT']['Type'] == 'String'


def test_filter_intervals(sample_mt):
    iv = hl.eval(hl.parse_locus_interval('20:10019093-20:13e6'))
    mt = hl.filter_intervals(sample_mt, [iv])
    n = mt.count_rows()
    assert 0 < n < 346
