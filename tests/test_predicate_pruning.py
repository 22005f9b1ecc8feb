"""Partition pruning from key-comparison filter predicates — the
ExtractIntervalFilters pass (reference expr/ir/ExtractIntervalFilters.scala;
tests mirror reference test/hail/extract_intervals/)."""

import hail_tpu as hl


def _bn(n_parts=10):
    return hl.balding_nichols_model(1, 5, 100, n_partitions=n_parts)


def test_locus_comparison_prunes_partitions():
    mt = _bn()
    probe = hl.Locus('1', 51, reference_genome='GRCh37')
    f = mt.filter_rows(mt.locus < probe)
    assert f.n_partitions() == 5
    assert f.count() == (50, 5)
    f = mt.filter_rows(mt.locus >= probe)
    assert f.n_partitions() == 5
    assert f.count() == (50, 5)


def test_locus_eq_single_partition():
    mt = _bn()
    probe = hl.Locus('1', 51, reference_genome='GRCh37')
    f = mt.filter_rows(mt.locus == probe)
    assert f.n_partitions() == 1
    assert f.count()[0] == 1


def test_position_and_contig_conjunction():
    mt = _bn()
    f = mt.filter_rows(hl.all(mt.locus.contig == '1', mt.locus.position < 11))
    assert f.n_partitions() == 1
    assert f.count()[0] == 10


def test_probe_expression_constant_folds():
    mt = _bn()
    f = mt.filter_rows(mt.locus > hl.locus('1', 90))
    assert f.n_partitions() == 1
    assert f.count()[0] == 10


def test_table_filter_prunes():
    ht = _bn().rows()
    probe = hl.Locus('1', 51, reference_genome='GRCh37')
    f = ht.filter(ht.locus < probe)
    assert f.n_partitions() == 5
    assert f.count() == 50


def test_unrecognized_predicate_keeps_all_partitions():
    mt = _bn()
    f = mt.filter_rows(mt.ancestral_af > 0.5)
    assert f.n_partitions() == 10


def test_filter_out_does_not_prune():
    mt = _bn()
    probe = hl.Locus('1', 51, reference_genome='GRCh37')
    f = mt.filter_rows(mt.locus < probe, keep=False)
    assert f.n_partitions() == 10
    assert f.count() == (50, 5)
