"""Annotation datasets + DB (reference experimental/datasets.py, db.py).

Offline: tests build local .ht datasets, point a registry JSON at them via
HAIL_TPU_DATASETS_CONFIG, and drive load_dataset / DB.annotate_rows_db."""

import json

import pytest

import hail_tpu as hl
from hail_tpu.experimental.datasets import DB, get_datasets_metadata, load_dataset


@pytest.fixture
def registry(tmp_path, monkeypatch):
    # CADD-like unique-keyed dataset: (locus, alleles) -> score
    mt = hl.balding_nichols_model(1, 3, 12, reference_genome='GRCh37')
    ht = mt.rows().select()
    ht = ht.annotate(score=hl.float64(ht.locus.position) / 10)
    cadd_path = str(tmp_path / 'cadd.ht')
    ht.write(cadd_path)

    # clinvar-like non-unique dataset: same keys, we just declare non-unique
    clin = ht.annotate(significance='benign')
    clin_path = str(tmp_path / 'clin.ht')
    clin.write(clin_path)

    # gencode-like interval-keyed dataset
    rg = 'GRCh37'
    gtbl = hl.Table.parallelize(
        [hl.Struct(interval=hl.utils.Interval(hl.genetics.Locus('1', 1, rg),
                                              hl.genetics.Locus('1', 500000, rg)),
                   gene_name='GENE_A'),
         hl.Struct(interval=hl.utils.Interval(hl.genetics.Locus('1', 500000, rg),
                                              hl.genetics.Locus('1', 900000000, rg)),
                   gene_name='GENE_B')],
        hl.tstruct(interval=hl.tinterval(hl.tlocus(rg)), gene_name=hl.tstr),
        key=['interval'])
    gencode_path = str(tmp_path / 'gencode.ht')
    gtbl.write(gencode_path)

    # gene-keyed dataset: gene -> metric
    genes = hl.Table.parallelize(
        [hl.Struct(gene='GENE_A', pLI=0.9), hl.Struct(gene='GENE_B', pLI=0.1)],
        hl.tstruct(gene=hl.tstr, pLI=hl.tfloat64), key=['gene'])
    genes_path = str(tmp_path / 'genes.ht')
    genes.write(genes_path)

    reg = {
        'test_cadd': {
            'annotation_db': {'key_properties': ['unique']},
            'description': 'test scores', 'url': 'http://example.org',
            'versions': [{'version': '1.0', 'reference_genome': 'GRCh37',
                          'url': cadd_path}],
        },
        'test_clinvar': {
            'annotation_db': {'key_properties': []},
            'description': 'test clinvar', 'url': 'http://example.org',
            'versions': [{'version': '1.0', 'reference_genome': 'GRCh37',
                          'url': clin_path}],
        },
        'gencode': {
            'annotation_db': {'key_properties': []},
            'description': 'test gencode', 'url': 'http://example.org',
            'versions': [{'version': 'v19', 'reference_genome': 'GRCh37',
                          'url': gencode_path}],
        },
        'test_gene_metrics': {
            'annotation_db': {'key_properties': ['gene', 'unique']},
            'description': 'per-gene metric', 'url': 'http://example.org',
            'versions': [{'version': '1.0', 'reference_genome': 'GRCh37',
                          'url': genes_path}],
        },
        'plain_dataset': {   # no annotation_db stanza: load_dataset only
            'description': 'plain', 'url': 'http://example.org',
            'versions': [{'version': '2.0', 'reference_genome': 'GRCh37',
                          'url': cadd_path}],
        },
    }
    reg_path = str(tmp_path / 'registry.json')
    with open(reg_path, 'w') as f:
        json.dump(reg, f)
    monkeypatch.setenv('HAIL_TPU_DATASETS_CONFIG', reg_path)
    return mt


def test_bundled_registry_parses():
    meta = get_datasets_metadata()
    assert 'CADD' in meta and 'gencode' in meta
    assert meta['CADD']['annotation_db']['key_properties'] == ['unique']


def test_load_dataset_local(registry):
    ht = load_dataset('plain_dataset', '2.0', 'GRCh37')
    assert ht.count() == 12
    assert ht.score.take(1)[0] is not None


def test_load_dataset_validation(registry):
    with pytest.raises(ValueError, match='not a dataset available'):
        load_dataset('nope', '1.0', 'GRCh37')
    with pytest.raises(ValueError, match='Version'):
        load_dataset('plain_dataset', '9.9', 'GRCh37')
    with pytest.raises(ValueError, match='Reference genome build'):
        load_dataset('plain_dataset', '2.0', 'GRCh38')
    with pytest.raises(ValueError, match='region'):
        load_dataset('plain_dataset', '2.0', 'GRCh37', region='mars')
    with pytest.raises(ValueError, match='cloud'):
        load_dataset('plain_dataset', '2.0', 'GRCh37', cloud='diy')


def test_db_available_datasets(registry):
    db = DB()
    # plain_dataset has no annotation_db stanza -> not listed
    assert db.available_datasets == ['gencode', 'test_cadd', 'test_clinvar',
                                     'test_gene_metrics']


def test_db_annotate_unique(registry):
    mt = registry
    db = DB()
    out = db.annotate_rows_db(mt, 'test_cadd')
    rows = out.rows()
    got = rows.select(s=rows.test_cadd.score).collect()
    assert len(got) == 12
    assert all(abs(r.s - r.locus.position / 10) < 1e-12 for r in got)


def test_db_annotate_all_matches_array(registry):
    mt = registry
    db = DB()
    out = db.annotate_rows_db(mt.rows(), 'test_clinvar')
    r = out.take(1)[0]
    # non-unique key_properties -> array of matching rows
    assert isinstance(r.test_clinvar, list)
    assert r.test_clinvar[0].significance == 'benign'


def test_db_annotate_gene_keyed(registry):
    mt = registry
    db = DB()
    out = db.annotate_rows_db(mt, 'test_gene_metrics')
    rows = out.rows().collect()
    for r in rows:
        d = r.test_gene_metrics
        if r.locus.position < 500000:
            assert dict(d) == {'GENE_A': hl.Struct(pLI=0.9)}
        else:
            assert dict(d) == {'GENE_B': hl.Struct(pLI=0.1)}


def test_db_validation(registry):
    with pytest.raises(ValueError, match='region'):
        DB(region='mars')
    with pytest.raises(ValueError, match='not available'):
        DB(region='us', cloud='gcp')
    db = DB()
    mt = registry
    with pytest.raises(ValueError, match='duplicates'):
        db.annotate_rows_db(mt, 'test_cadd', 'test_cadd')
    with pytest.raises(ValueError, match='not available'):
        db.annotate_rows_db(mt, 'no_such_dataset')
