"""Aggregator combinators (group_by/explode/array_agg/fold) in NON-toplevel
contexts — per-row and per-column entry aggregations (round-1 verdict item 8;
the reference supports them anywhere, agg/Extract.scala)."""

import numpy as np
import pytest

import hail_tpu as hl


@pytest.fixture(scope='module')
def mt():
    mt = hl.balding_nichols_model(2, 8, 12, n_partitions=3)
    mt = mt.annotate_entries(nalt=mt.GT.n_alt_alleles())
    return mt.persist()


def test_group_by_per_row(mt):
    r = mt.annotate_rows(
        by_gt=hl.agg.group_by(mt.nalt, hl.agg.count())).rows().collect()
    # oracle via entries
    ent = mt.entries().collect()
    from collections import Counter, defaultdict
    oracle = defaultdict(Counter)
    for e in ent:
        oracle[str(e.locus)][e.nalt] += 1
    assert len(r) == 12
    for row in r:
        got = {k: v for k, v in row.by_gt.items()}
        assert got == dict(oracle[str(row.locus)]), (row.locus, got)


def test_group_by_per_col(mt):
    c = mt.annotate_cols(
        by_gt=hl.agg.group_by(mt.nalt, hl.agg.count())).cols().collect()
    ent = mt.entries().collect()
    from collections import Counter, defaultdict
    oracle = defaultdict(Counter)
    for e in ent:
        oracle[e.sample_idx][e.nalt] += 1
    assert len(c) == 8
    for col in c:
        assert dict(col.by_gt) == dict(oracle[col.sample_idx])


def test_fold_per_row(mt):
    r = mt.annotate_rows(
        s=hl.agg.fold(0, lambda acc: acc + mt.nalt, lambda a, b: a + b)
    ).rows().collect()
    ent = mt.entries().collect()
    from collections import defaultdict
    oracle = defaultdict(int)
    for e in ent:
        oracle[str(e.locus)] += e.nalt
    for row in r:
        assert row.s == oracle[str(row.locus)], row


def test_explode_per_row(mt):
    mt2 = mt.annotate_entries(pair=hl.array([mt.nalt, mt.nalt * 10]))
    r = mt2.annotate_rows(
        tot=hl.agg.explode(lambda x: hl.agg.sum(x), mt2.pair)).rows().collect()
    ent = mt.entries().collect()
    from collections import defaultdict
    oracle = defaultdict(int)
    for e in ent:
        oracle[str(e.locus)] += e.nalt * 11
    for row in r:
        assert row.tot == oracle[str(row.locus)], row


def test_array_agg_per_row(mt):
    mt2 = mt.annotate_entries(pair=hl.array([mt.nalt, mt.nalt * 2]))
    r = mt2.annotate_rows(
        sums=hl.agg.array_agg(lambda x: hl.agg.sum(x), mt2.pair)).rows().collect()
    ent = mt.entries().collect()
    from collections import defaultdict
    oracle = defaultdict(int)
    for e in ent:
        oracle[str(e.locus)] += e.nalt
    for row in r:
        assert list(row.sums) == [oracle[str(row.locus)],
                                  2 * oracle[str(row.locus)]], row


def test_toplevel_still_works(mt):
    d = mt.aggregate_entries(hl.agg.group_by(mt.nalt, hl.agg.count()))
    ent = mt.entries().collect()
    from collections import Counter
    oracle = Counter(e.nalt for e in ent)
    assert dict(d) == dict(oracle)


def test_tree_combine_branching_factor(monkeypatch):
    """Tree-reduce with small branching factor matches sequential fold and
    preserves order-sensitive aggregators (reference LowerTableIR tree)."""
    import hail_tpu as hl
    from hail_tpu.context import Env
    monkeypatch.setattr(Env.hc(), 'branching_factor', 2)
    t = hl.utils.range_table(1000, n_partitions=37)
    res = t.aggregate(hl.struct(s=hl.agg.sum(t.idx),
                                c=hl.agg.collect(t.idx),
                                tk=hl.agg.take(t.idx, 5)))
    assert res.s == 999 * 1000 // 2
    assert res.c == list(range(1000))
    assert res.tk == [0, 1, 2, 3, 4]
