import os

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import types as ht


def test_range_table():
    t = hl.range_table(100, 7)
    assert t.count() == 100
    assert t.n_partitions() == 7
    assert [r.idx for r in t.take(3)] == [0, 1, 2]


def test_annotate_select_filter():
    t = hl.range_table(10)
    t = t.annotate(x=t.idx * 2, y=hl.str(t.idx))
    rows = t.collect()
    assert rows[3].x == 6 and rows[3].y == '3'
    t2 = t.select('x')
    assert list(t2._stage.row_type.fields) == ['idx', 'x']
    t3 = t.filter(t.idx > 5)
    assert t3.count() == 4
    t4 = t.filter(t.idx > 5, keep=False)
    assert t4.count() == 6
    t5 = t.drop('y')
    assert 'y' not in t5._stage.row_type.fields
    t6 = t.transmute(z=t.x + 1)
    assert 'x' not in t6._stage.row_type.fields
    assert t6.collect()[0].z == 1


def test_aggregate():
    t = hl.range_table(100)
    assert t.aggregate(hl.agg.count()) == 100
    assert t.aggregate(hl.agg.sum(t.idx)) == 4950
    assert t.aggregate(hl.agg.mean(t.idx)) == 49.5
    assert t.aggregate(hl.agg.min(t.idx)) == 0
    assert t.aggregate(hl.agg.max(t.idx)) == 99
    s = t.aggregate(hl.agg.stats(t.idx))
    assert s.n == 100 and abs(s.stdev - np.arange(100).std()) < 1e-9
    assert t.aggregate(hl.agg.fraction(t.idx < 50)) == 0.5
    assert t.aggregate(hl.agg.count_where(t.idx % 10 == 0)) == 10
    assert t.aggregate(hl.agg.filter(t.idx < 10, hl.agg.sum(t.idx))) == 45
    c = t.aggregate(hl.agg.counter(t.idx % 3))
    assert c[0] == 34 and c[1] == 33 and c[2] == 33
    taken = t.aggregate(hl.agg.take(t.idx, 5))
    assert taken == [0, 1, 2, 3, 4]
    col = t.aggregate(hl.agg.collect(t.idx % 2))
    assert len(col) == 100
    assert t.aggregate(hl.agg.collect_as_set(t.idx % 2)) == {0, 1}
    assert t.aggregate(hl.agg.any(t.idx == 55)) is True
    assert t.aggregate(hl.agg.all(t.idx < 200)) is True
    h = t.aggregate(hl.agg.hist(hl.float64(t.idx), 0, 100, 10))
    assert h.bin_freq == [10] * 10
    corr = t.aggregate(hl.agg.corr(hl.float64(t.idx), hl.float64(t.idx) * 2 + 1))
    assert abs(corr - 1.0) < 1e-12


def test_group_by():
    t = hl.range_table(30)
    g = t.group_by(k=t.idx % 3).aggregate(n=hl.agg.count(), s=hl.agg.sum(t.idx))
    rows = {r.k: r for r in g.collect()}
    assert rows[0].n == 10
    assert rows[1].s == sum(i for i in range(30) if i % 3 == 1)


def test_order_by():
    t = hl.range_table(10)
    t = t.annotate(v=(t.idx * 7) % 10)
    ordered = t.order_by('v').collect()
    assert [r.v for r in ordered] == sorted((i * 7) % 10 for i in range(10))
    desc = t.order_by(hl.desc('v')).collect()
    assert [r.v for r in desc] == sorted(((i * 7) % 10 for i in range(10)), reverse=True)


def test_joins():
    t1 = hl.range_table(10)
    t1 = t1.annotate(a=t1.idx * 2)
    t2 = hl.range_table(5)
    t2 = t2.annotate(b=t2.idx * 10).key_by('idx')
    j = t1.key_by('idx').join(t2, how='inner')
    assert j.count() == 5
    r = {x.idx: x for x in j.collect()}
    assert r[3].b == 30 and r[3].a == 6
    jl = t1.key_by('idx').join(t2, how='left')
    assert jl.count() == 10
    assert {x.idx: x.b for x in jl.collect()}[7] is None
    jo = t2.join(t1.key_by('idx'), how='outer')
    assert jo.count() == 10
    # semi / anti
    assert t1.key_by('idx').semi_join(t2).count() == 5
    assert t1.key_by('idx').anti_join(t2).count() == 5


def test_index_join():
    t1 = hl.range_table(10)
    t2 = hl.range_table(10)
    t2 = t2.annotate(sq=t2.idx * t2.idx)
    t1b = t1.annotate(other=t2[t1.idx].sq)
    assert [r.other for r in t1b.collect()] == [i * i for i in range(10)]


def test_union_distinct_explode():
    t1 = hl.range_table(5)
    t2 = hl.range_table(5)
    u = t1.union(t2)
    assert u.count() == 10
    assert u.distinct().count() == 5
    t = hl.range_table(3).annotate(arr=hl.range(3))
    e = t.explode('arr')
    assert e.count() == 9
    rows = e.collect()
    assert rows[0].arr == 0 and rows[1].arr == 1


def test_head_tail_sample_add_index():
    t = hl.range_table(100, 4)
    assert t.head(7).count() == 7
    assert t.tail(7).count() == 7
    assert [r.idx for r in t.tail(3).collect()] == [97, 98, 99]
    ti = t.add_index('i2')
    assert [r.i2 for r in ti.take(3)] == [0, 1, 2]
    s = t.sample(0.5, seed=1)
    assert 20 < s.count() < 80


def test_globals():
    t = hl.range_table(5)
    t = t.annotate_globals(g1=5, g2='hello')
    assert hl.eval(t.globals.g1) == 5
    t2 = t.annotate(x=t.idx + t.g1)
    assert t2.collect()[0].x == 5
    t3 = t.select_globals('g2')
    assert list(t3._stage.globals_type.fields) == ['g2']


def test_write_read(tmp_path):
    t = hl.range_table(20, 3)
    t = t.annotate(x=t.idx * 1.5, s=hl.str(t.idx), arr=hl.range(t.idx % 3))
    p = str(tmp_path / 'test.ht')
    t.write(p)
    t2 = hl.read_table(p)
    assert t2.count() == 20
    r1, r2 = t.collect(), t2.collect()
    for a, b in zip(r1, r2):
        assert a == b
    assert t2.n_partitions() == 3


def test_checkpoint_persist(tmp_path):
    t = hl.range_table(10).annotate(x=2)
    t2 = t.checkpoint(str(tmp_path / 'cp.ht'))
    assert t2.count() == 10
    t3 = t.persist()
    assert t3.count() == 10


def test_to_pandas_parallelize():
    t = hl.range_table(5)
    t = t.annotate(y='a')
    df = t.to_pandas()
    assert list(df.columns) == ['idx', 'y']
    assert len(df) == 5
    t2 = hl.parallelize([hl.Struct(a=1, b='x'), hl.Struct(a=2, b='y')], key='a')
    assert t2.count() == 2
    assert t2.collect()[0].b == 'x'


def test_repartition():
    t = hl.range_table(100, 2).repartition(8)
    assert t.n_partitions() == 8
    assert t.count() == 100


def test_rename_key_by():
    t = hl.range_table(5).rename({'idx': 'index'})
    assert 'index' in t._stage.row_type.fields
    t2 = hl.range_table(5).key_by()
    assert t2._stage.key == []


def test_expr_collect_show(capsys):
    t = hl.range_table(5)
    assert t.idx.collect() == [0, 1, 2, 3, 4]
    assert t.idx.take(2) == [0, 1]
    t.show(3)
    out = capsys.readouterr().out
    assert 'idx' in out


def test_table_method_parity_batch():
    t = hl.Table.parallelize(
        [{'k': 'a', 'x': 1, 'y': 2.0}, {'k': 'a', 'x': 3, 'y': 4.0},
         {'k': 'b', 'x': 5, 'y': 6.0}],
        hl.dtype('struct{k:str,x:int32,y:float64}'), key='k')
    rows = t.collect_by_key().collect()
    assert rows[0].k == 'a' and len(rows[0]['values']) == 2
    t2 = hl.Table.parallelize([{'a': {'b': 1, 'c': 'z'}, 'd': 5}],
                              hl.dtype('struct{a: struct{b: int32, c: str}, d: int32}'))
    assert t2.flatten().collect()[0]['a.b'] == 1
    ex = hl.Table.parallelize([{'l': hl.Locus('1', 100), 'c': hl.Call([0, 1])}],
                              hl.dtype('struct{l: locus<GRCh37>, c: call}')).expand_types()
    r0 = ex.collect()[0]
    assert r0.l.contig == '1' and r0.c == '0/1'
    import pandas as pd
    tp = hl.Table.from_pandas(pd.DataFrame({'s': ['x', 'y'], 'v': [1.5, 2.5]}), key='s')
    assert tp.count() == 2
    mt = t.to_matrix_table_row_major(['x'], entry_field_name='val')
    assert mt.count_rows() == 3 and mt.count_cols() == 1
    g = t.group_by('k').partition_hint(4).aggregate(n=hl.agg.count())
    assert {r.k: r.n for r in g.collect()} == {'a': 2, 'b': 1}


def test_class_method_namespace_parity():
    import re

    def methods_of(src_path, cls):
        src = open(src_path).read()
        m = re.search(rf'^class {cls}\b.*?(?=^class |\Z)', src, re.S | re.M)
        return set(re.findall(r'^    def ([a-z][a-z0-9_]*)\(', m.group(0), re.M))

    R = '/root/reference/hail/python/hail/'
    for cls, path, mine in [('Table', R + 'table.py', hl.Table),
                            ('MatrixTable', R + 'matrixtable.py', hl.MatrixTable),
                            ('GroupedTable', R + 'table.py', hl.GroupedTable),
                            ('BlockMatrix', R + 'linalg/blockmatrix.py',
                             hl.linalg.BlockMatrix)]:
        missing = sorted(m for m in methods_of(path, cls) if not hasattr(mine, m))
        assert missing == [], (cls, missing)


def test_distributed_sample_sort():
    t = hl.utils.range_table(1000, n_partitions=8)
    t = t.annotate(v=(t.idx * 37) % 1000)
    s = t.order_by('v')
    assert s.n_partitions() > 1  # sample-sort keeps parallel output partitions
    got = [r.v for r in s.collect()]
    assert got == sorted(got)
    got_desc = [r.v for r in t.order_by(hl.desc('v')).collect()]
    assert got_desc == sorted(got_desc, reverse=True)


def test_semantic_hash_execution_cache(tmp_path):
    import os
    d = str(tmp_path / 'cache')
    hl._set_flags(use_fast_restarts='1', cachedir=d)
    try:
        assert hl.eval(hl.literal(21) * 2) == 42
        assert len(os.listdir(d)) == 1
        assert hl.eval(hl.literal(21) * 2) == 42  # cache hit
        assert hl.eval(hl.literal(21) * 3) == 63
        assert len(os.listdir(d)) == 2
        hl.eval(hl.rand_unif(0, 1))  # nondeterministic: never cached
        assert len(os.listdir(d)) == 2
    finally:
        hl._set_flags(use_fast_restarts='0', cachedir='')
