import os

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import vds as hvds
from hail_tpu import types as ht

GVCF_HEADER = '''##fileformat=VCFv4.2
##FORMAT=<ID=GT,Number=1,Type=String,Description="">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="">
##INFO=<ID=END,Number=1,Type=Integer,Description="">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}
'''


def write_gvcf(path, sample, records):
    with open(path, 'w') as f:
        f.write(GVCF_HEADER.format(sample=sample))
        for rec in records:
            f.write(rec + '\n')


@pytest.fixture
def gvcfs(tmp_path):
    p1 = str(tmp_path / 's1.g.vcf')
    p2 = str(tmp_path / 's2.g.vcf')
    # sample 1: ref block 20:100-199, variant at 20:150? No: variant sites are
    # separate rows; block covers 100-200, variant at 300
    write_gvcf(p1, 'S1', [
        '20\t100\t.\tA\t<NON_REF>\t.\t.\tEND=200\tGT:DP:GQ\t0/0:30:99',
        '20\t300\t.\tA\tT,<NON_REF>\t50\t.\t.\tGT:DP:GQ\t0/1:25:80',
    ])
    # sample 2: block covers 250-350 (so covers S1's variant at 300);
    # variant at 150 (covered by S1's block)
    write_gvcf(p2, 'S2', [
        '20\t150\t.\tG\tC,<NON_REF>\t60\t.\t.\tGT:DP:GQ\t1/1:20:70',
        '20\t250\t.\tA\t<NON_REF>\t.\t.\tEND=350\tGT:DP:GQ\t0/0:28:95',
    ])
    return p1, p2


def test_transform_and_combine(gvcfs, tmp_path):
    p1, p2 = gvcfs
    from hail_tpu.vds.combiner import transform_gvcf, combine_variant_datasets
    mt1 = hl.import_vcf(p1)
    v1 = transform_gvcf(mt1)
    assert v1.reference_data.count_rows() == 1
    assert v1.variant_data.count_rows() == 1
    # <NON_REF> dropped from variant alleles
    assert v1.variant_data.rows().collect()[0].alleles == ['A', 'T']
    mt2 = hl.import_vcf(p2)
    v2 = transform_gvcf(mt2)
    merged = combine_variant_datasets([v1, v2])
    assert merged.variant_data.count_cols() == 2
    assert merged.variant_data.count_rows() == 2
    assert merged.reference_data.count_rows() == 2


def test_combiner_run_and_dense(gvcfs, tmp_path):
    p1, p2 = gvcfs
    out = str(tmp_path / 'out.vds')
    temp = str(tmp_path / 'tmp')
    os.makedirs(temp)
    c = hvds.new_combiner(output_path=out, temp_path=temp,
                          gvcf_paths=[p1, p2], reference_genome='GRCh37',
                          import_interval_size=1_000_000_000)
    c.run()
    assert c.finished
    final = hvds.read_vds(out)
    assert final.n_samples() == 2
    dense = hvds.to_dense_mt(final)
    assert dense.count_rows() == 2
    ents = {(str(e.locus), e.s): e for e in dense.entries().collect()}
    # the combiner localizes GT to LGT (reference combine.py make_*_entry)
    # S1's variant at 300: S2 covered by block 250-350 → hom ref fill
    e = ents[('20:300', 'S2')]
    assert e.LGT is not None and e.LGT.is_hom_ref()
    assert e.DP == 28 and e.GQ == 95
    # S2's variant at 150: S1 covered by block 100-200 → hom ref fill
    e2 = ents[('20:150', 'S1')]
    assert e2.LGT is not None and e2.LGT.is_hom_ref()
    assert e2.DP == 30
    # the actual variant calls survive
    assert ents[('20:300', 'S1')].LGT.is_het()
    assert ents[('20:150', 'S2')].LGT.is_hom_var()


def test_combiner_resumable(gvcfs, tmp_path):
    p1, p2 = gvcfs
    out = str(tmp_path / 'out2.vds')
    temp = str(tmp_path / 'tmp2')
    os.makedirs(temp)
    c = hvds.new_combiner(output_path=out, temp_path=temp, gvcf_paths=[p1, p2],
                          import_interval_size=1_000_000_000)
    c.save()
    # reload the plan and run
    c2 = hvds.load_combiner(c.save_path)
    assert c2.gvcf_paths == [p1, p2]
    c2.run()
    assert hvds.read_vds(out).n_samples() == 2


def test_vds_filters(gvcfs, tmp_path):
    p1, p2 = gvcfs
    from hail_tpu.vds.combiner import transform_gvcf, combine_variant_datasets
    merged = combine_variant_datasets([transform_gvcf(hl.import_vcf(p)) for p in (p1, p2)])
    f = hvds.filter_samples(merged, ['S1'])
    assert f.variant_data.count_cols() == 1
    iv = hl.eval(hl.parse_locus_interval('20:100-200'))
    f2 = hvds.filter_intervals(merged, [iv])
    assert f2.variant_data.count_rows() == 1
    vds2 = hvds.split_multi(merged)
    assert vds2.variant_data.count_rows() >= merged.variant_data.count_rows()


def test_vds_write_read(gvcfs, tmp_path):
    p1, _ = gvcfs
    from hail_tpu.vds.combiner import transform_gvcf
    v = transform_gvcf(hl.import_vcf(p1))
    p = str(tmp_path / 'one.vds')
    v.write(p)
    v2 = hvds.read_vds(p)
    assert v2.variant_data.count_rows() == 1
    v3 = v.checkpoint(str(tmp_path / 'cp.vds'))
    assert v3.n_samples() == 1


def test_interval_coverage_and_ploidy(gvcfs, tmp_path):
    p1, p2 = gvcfs
    from hail_tpu.vds.combiner import transform_gvcf, combine_variant_datasets
    merged = combine_variant_datasets([transform_gvcf(hl.import_vcf(p)) for p in (p1, p2)])
    iv = hl.eval(hl.parse_locus_interval('20:100-300'))
    cov = hvds.interval_coverage(merged, [iv])
    assert cov.count() == (1, 2)
    e = {x.s: x for x in cov.entries().collect()}
    # reference schema: bases over thresholds + sum_dp/mean_dp over the
    # interval size. S1's block covers 100-200 → 101 bases within [100, 300]
    assert e['S1'].bases_over_gq_threshold[0] == 101
    assert e['S1'].sum_dp == 101 * 30
    # S2's block covers 250-350 → clipped to [250, 300) → 50 bases
    assert e['S2'].bases_over_dp_threshold[0] == 50
    civ = [hl.eval(hl.parse_locus_interval('20:100-201'))]
    t = hvds.impute_sex_chromosome_ploidy(merged, civ, '20')
    rows = {r.s: r for r in t.collect()}
    # reference semantics: mean over the interval SIZE (101 bases, all
    # covered by S1's DP-30 block)
    assert rows['S1'].autosomal_mean_dp == 30.0
    assert rows['S1'].x_ploidy == 0.0  # no X blocks


def test_truncate_reference_blocks(gvcfs):
    p1, _ = gvcfs
    from hail_tpu.vds.combiner import transform_gvcf
    v = transform_gvcf(hl.import_vcf(p1))
    t = hvds.truncate_reference_blocks(v, max_ref_block_base_pairs=30)
    # block 100-200 (101bp) → ceil(101/30)=4 pieces
    assert t.reference_data.count_rows() == 4
    ents = t.reference_data.entries().collect()
    assert ents[0].locus.position == 100 and ents[0].END == 129
    assert ents[-1].END == 200 and ents[-1].LEN == 200 - ents[-1].locus.position + 1


def test_lgt_to_gt_and_local_to_global():
    assert str(hl.eval(hl.vds.lgt_to_gt(hl.call(0, 1), hl.literal([0, 3])))) == '0/3'
    assert hl.eval(hl.vds.local_to_global(
        hl.literal([9, 10]), hl.literal([0, 2]), 3, 0, 'R')) == [9, 0, 10]
    assert hl.eval(hl.vds.local_to_global(
        hl.literal([94, 0, 123]), hl.literal([0, 2]), 3, 999, 'G')) == \
        [94, 999, 999, 0, 999, 123]
    assert hl.eval(hl.vds.local_to_global(
        hl.literal([10]), hl.literal([0, 2]), 3, 0, 'A')) == [0, 10]


def _ref_block_mt():
    mt = hl.utils.range_matrix_table(3, 2)
    mt = mt.key_rows_by(locus=hl.locus('1', 100 + mt.row_idx * 10),
                        alleles=hl.literal(['N', '<NON_REF>']))
    mt = mt.annotate_entries(GT=hl.call(0, 0),
                             END=hl.or_missing(mt.row_idx == 0,
                                               hl.int32(115 + mt.col_idx * 10)))
    return mt.filter_entries(mt.row_idx == 0)


def test_densify_fills_reference_blocks():
    d = hl.experimental.densify(_ref_block_mt())
    ents = {(e.locus.position, e.col_idx): str(e.GT)
            for e in d.entries().collect() if e.GT is not None}
    assert ents.get((110, 0)) == '0/0' and (120, 0) not in ents
    assert ents.get((110, 1)) == '0/0' and ents.get((120, 1)) == '0/0'


def test_segment_and_merge_reference_blocks():
    mt = _ref_block_mt()
    iv = hl.Table.parallelize(
        [{'interval': hl.Interval(hl.Locus('1', 105), hl.Locus('1', 118), True, False)}],
        hl.dtype('struct{interval: interval<locus<GRCh37>>}')).key_by('interval')
    seg = hl.vds.segment_reference_blocks(mt, iv)
    rows = [(e.locus.position, e.col_idx, e.END)
            for e in seg.entries().collect() if e.END is not None]
    assert (105, 0, 115) in rows and (105, 1, 117) in rows
    mt3 = hl.utils.range_matrix_table(2, 1)
    mt3 = mt3.key_rows_by(locus=hl.locus('1', 100 + mt3.row_idx * 10),
                          alleles=hl.literal(['N', '<NON_REF>']))
    mt3 = mt3.annotate_entries(END=hl.int32(109 + mt3.row_idx * 10), GQ=30)
    merged = hl.vds.merge_reference_blocks(mt3, lambda b1, b2: b1.GQ == b2.GQ)
    out = [(e.locus.position, e.END) for e in merged.entries().collect()
           if e.END is not None]
    assert out == [(100, 119)]
