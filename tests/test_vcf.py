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


def test_bgen_gen_plink_roundtrips(tmp_path):
    mt = hl.balding_nichols_model(1, 8, 20)
    out = str(tmp_path / 'x')
    gp = hl.map(lambda i: hl.if_else(mt.GT.n_alt_alleles() == i, 1.0, 0.0),
                hl.range(0, 3))
    hl.export_bgen(mt, out, gp=gp)
    hl.index_bgen(out + '.bgen')
    mt2 = hl.import_bgen(out + '.bgen', entry_fields=['GT', 'GP', 'dosage'])
    assert mt2.count() == (20, 8)
    g1 = mt.entries().collect()
    g2 = mt2.entries().collect()
    assert all(a.GT == b.GT for a, b in zip(g1, g2))
    assert os.path.exists(out + '.bgen.idx2')
    hl.export_gen(mt2, str(tmp_path / 'g'))
    mt3 = hl.import_gen(str(tmp_path / 'g.gen'), str(tmp_path / 'g.sample'))
    assert mt3.count() == (20, 8)
    hl.export_plink(mt, str(tmp_path / 'p'))
    mt4 = hl.import_plink(str(tmp_path / 'p.bed'), str(tmp_path / 'p.bim'),
                          str(tmp_path / 'p.fam'))
    g4 = mt4.entries().collect()
    assert all((a.GT is None) == (b.GT is None)
               and (a.GT is None or a.GT.n_alt_alleles() == b.GT.n_alt_alleles())
               for a, b in zip(g1, g4))


def test_import_avro():
    t = hl.import_avro('/root/reference/hail/hail/test/resources/avro/weather.avro')
    assert t.count() == 5
    assert str(t._stage.row_type) == 'struct{station: str, time: int64, temp: int32}'


def test_import_gvcf_interval():
    # reference impex.py import_gvcf_interval (GVCFPartitionReader)
    p = '/root/reference/hail/hail/test/resources/gvcfs/HG00268.g.vcf.gz'
    t = hl.import_gvcf_interval(p, 0, 'chr20', 17959646, 17959700,
                                reference_genome='GRCh38')
    rows = t.collect()
    assert [r.locus.position for r in rows] == [17959646, 17959647, 17959680, 17959681]
    assert all(r.file_num == 0 for r in rows)
    assert str(rows[0].entries[0].GT) == '0/0'
    # reference block spanning `start` (INFO END >= start) is included
    t2 = hl.import_gvcf_interval(p, 1, 'chr20', 17959600, 17959647,
                                 reference_genome='GRCh38')
    first = t2.collect()[0]
    assert first.locus.position == 17959480
    assert first.info.END == 17959645
