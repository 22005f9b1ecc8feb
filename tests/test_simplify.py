"""Simplify rewrite layer (ir/simplify.py; reference
`is/hail/expr/ir/Simplify.scala` rules applied at operator construction)."""

import numpy as np

import hail_tpu as hl


def _counting_table(n=100, parts=4):
    """range_table whose partition evaluations are observable."""
    t = hl.utils.range_table(n, parts)
    calls = {'n': 0}
    st = t._stage
    inner = st.partition_fn

    def pf(ctx):
        calls['n'] += 1
        return inner(ctx)
    st.partition_fn = pf
    return t, calls


def test_count_of_range_runs_nothing():
    t, calls = _counting_table(1000, 5)
    assert t.count() == 1000
    assert calls['n'] == 0


def test_count_through_length_preserving_ops_runs_nothing():
    t, calls = _counting_table(60, 3)
    t2 = t.annotate(y=t.idx * 2).select('y').rename({'y': 'z'}).drop()
    assert t2.count() == 60
    assert calls['n'] == 0


def test_count_after_filter_executes():
    t, calls = _counting_table(60, 3)
    t2 = t.filter(t.idx % 2 == 0)
    assert t2.count() == 30
    assert calls['n'] > 0


def test_force_count_always_executes():
    t, calls = _counting_table(40, 2)
    assert t._force_count() == 40
    assert calls['n'] == 2


def test_filter_literal_true_is_identity():
    t, calls = _counting_table(30, 2)
    assert t.filter(True) is t
    assert t.filter(hl.literal(True)) is t
    assert t.filter(False, keep=False) is t


def test_filter_literal_false_is_empty():
    t, _ = _counting_table(30, 2)
    e = t.filter(False)
    assert e.count() == 0
    assert e.collect() == []
    e2 = t.filter(hl.missing(hl.tbool))
    assert e2.count() == 0


def test_filter_chain_fuses_into_one_pass():
    t, calls = _counting_table(100, 4)
    t2 = t.filter(t.idx % 2 == 0)
    t3 = t2.filter(t2.idx % 3 == 0)
    t4 = t3.filter(t3.idx < 50)
    got = [r.idx for r in t4.collect()]
    assert got == [i for i in range(100) if i % 6 == 0 and i < 50]
    # one materialization of each parent partition — not one per filter
    assert calls['n'] == 4


def test_filter_fusion_matches_sequential_semantics():
    t = hl.utils.range_table(50, 3)
    t = t.annotate(v=(t.idx * 7919) % 13)
    a = t.filter(t.v > 3)
    b = a.filter(a.v < 11, keep=True)
    fused = b.filter(b.v == 7, keep=False)
    expected = [r.idx for r in t.collect()
                if r.v > 3 and r.v < 11 and not r.v == 7]
    assert [r.idx for r in fused.collect()] == expected


def test_random_predicate_not_fused():
    """Predicates with seeded randomness depend on row identity — the chain
    must not be re-planned around them."""
    t = hl.utils.range_table(40, 2)
    f1 = t.filter(t.idx % 2 == 0)
    f2 = f1.filter(hl.rand_bool(0.5, seed=42))
    # no fusion recorded for the random predicate
    assert getattr(f2, '_fused_filter', None) is None
    n = f2.count()
    assert 0 <= n <= 20
