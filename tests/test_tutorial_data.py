"""Tutorial datasets (reference utils/tutorial.py): synthesized offline with
the reference's file layout, schemas, and annotation columns."""

import os

import hail_tpu as hl


def test_get_movie_lens(tmp_path):
    d = str(tmp_path)
    hl.utils.get_movie_lens(d)
    users = hl.read_table(os.path.join(d, 'users.ht'))
    movies = hl.read_table(os.path.join(d, 'movies.ht'))
    ratings = hl.read_table(os.path.join(d, 'ratings.ht'))
    assert users.count() == 200
    assert movies.count() == 300
    assert ratings.count() == 5000
    # tutorial join: mean rating per occupation
    r = ratings.annotate(occ=users[ratings.user_id].occupation)
    means = r.group_by(r.occ).aggregate(mean=hl.agg.mean(r.rating)).collect()
    assert all(1.0 <= row.mean <= 5.0 for row in means)
    # idempotent: second call is a no-op
    hl.utils.get_movie_lens(d)


def test_get_1kg(tmp_path):
    d = str(tmp_path)
    hl.utils.get_1kg(d)
    for f in ('1kg.mt', '1kg.vcf.bgz', '1kg_annotations.txt',
              'ensembl_gene_annotations.txt'):
        assert os.path.exists(os.path.join(d, f)), f
    mt = hl.read_matrix_table(os.path.join(d, '1kg.mt'))
    assert mt.count() == (1200, 250)
    assert set(mt.entry.dtype.fields) >= {'GT', 'AD', 'DP', 'GQ'}
    # the GWAS-tutorial annotation join works
    t = hl.import_table(os.path.join(d, '1kg_annotations.txt'),
                        impute=True, key='Sample')
    assert set(t.row_value.dtype.fields) == {
        'Population', 'SuperPopulation', 'isFemale', 'PurpleHair',
        'CaffeineConsumption'}
    mt = mt.annotate_cols(pheno=t[mt.s])
    assert mt.cols().take(1)[0].pheno.SuperPopulation in (
        'AFR', 'AMR', 'EAS', 'EUR', 'SAS')
