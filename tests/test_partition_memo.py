"""In-memory partition memo (ir/memcache.py): repeated actions over a lazy
chain evaluate the shared prefix once (the reference amortizes via lowering
+ compile caching and Spark persist; weak-#6 re-execution fix)."""

import numpy as np

import hail_tpu as hl
from hail_tpu.ir import memcache
from hail_tpu.table import Table


def _counting_stage(t, calls):
    st = t._stage

    def f(batch, i):
        calls.append(i)
        return batch
    return Table(st.map_partitions(f, st.row_type))


def test_repeated_actions_evaluate_prefix_once():
    memcache.clear()
    calls = []
    t = _counting_stage(hl.utils.range_table(100, n_partitions=4), calls)
    t = t.annotate(x=t.idx * 2)
    assert t.count() == 100
    n_first = len(calls)
    assert n_first == 4
    assert t.count() == 100
    t.collect()
    t.aggregate(hl.agg.sum(t.x))
    assert len(calls) == n_first  # prefix never re-evaluated


def test_derived_pipelines_share_prefix():
    memcache.clear()
    calls = []
    t = _counting_stage(hl.utils.range_table(60, n_partitions=3), calls)
    a = t.annotate(x=t.idx + 1)
    b = t.annotate(y=t.idx * 10)
    a.count()
    assert len(calls) == 3
    b.count()  # different downstream op, same parent partitions
    assert len(calls) == 3


def test_budget_zero_disables():
    memcache.clear()
    calls = []
    with hl._with_flags(partition_cache_bytes='0'):
        t = _counting_stage(hl.utils.range_table(40, n_partitions=2), calls)
        t2 = t.annotate(x=t.idx)
        t2.count()
        t2.count()
    assert len(calls) == 4


def test_lru_eviction_bounds_memory():
    memcache.clear()
    with hl._with_flags(partition_cache_bytes=str(200_000)):
        for k in range(10):
            t = hl.utils.range_table(5000, n_partitions=2)
            t = t.annotate(x=t.idx * k)
            t.count()
        st = memcache.stats()
        assert st['bytes'] <= 200_000
    memcache.clear()


def test_results_identical_with_and_without_memo():
    memcache.clear()
    t = hl.utils.range_table(50, n_partitions=4)
    t = t.annotate(x=t.idx ** 2)
    r1 = t.collect()
    r2 = t.collect()  # memo path
    assert r1 == r2
    mt = hl.balding_nichols_model(2, 10, 20)
    mt = hl.variant_qc(mt)
    af1 = [r.variant_qc.AF for r in mt.rows().collect()]
    af2 = [r.variant_qc.AF for r in mt.rows().collect()]
    assert af1 == af2
