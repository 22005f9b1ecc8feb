import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import types as ht


def test_scan_sum_count_multi_partition():
    t = hl.range_table(20, 4)
    t = t.annotate(csum=hl.scan.sum(t.idx), cnt=hl.scan.count())
    rows = t.collect()
    assert [r.csum for r in rows] == [sum(range(i)) for i in range(20)]
    assert [r.cnt for r in rows] == list(range(20))


def test_scan_min_max_mean_collect():
    t = hl.range_table(12, 3)
    t = t.annotate(cmin=hl.scan.min(t.idx), cmax=hl.scan.max(t.idx),
                   cmean=hl.scan.mean(t.idx), coll=hl.scan.collect(t.idx))
    rows = t.collect()
    assert rows[0].cmin is None and rows[0].cmax is None and rows[0].cmean is None
    assert rows[5].cmin == 0 and rows[5].cmax == 4
    assert rows[4].cmean == 1.5
    assert rows[3].coll == [0, 1, 2]


def test_scan_count_where():
    t = hl.range_table(10, 2)
    t = t.annotate(cw=hl.scan.count_where(t.idx % 2 == 0))
    rows = t.collect()
    assert [r.cw for r in rows] == [sum(1 for j in range(i) if j % 2 == 0) for i in range(10)]


def test_agg_group_by():
    t = hl.range_table(20)
    g = t.aggregate(hl.agg.group_by(t.idx % 3, hl.agg.sum(t.idx)))
    for k in range(3):
        assert g[k] == sum(i for i in range(20) if i % 3 == k)
    g2 = t.aggregate(hl.agg.group_by(t.idx % 2, hl.struct(n=hl.agg.count(), mx=hl.agg.max(t.idx))))
    assert g2[1].n == 10 and g2[1].mx == 19


def test_agg_explode():
    t = hl.range_table(10).annotate(arr=hl.range(3))
    total = t.aggregate(hl.agg.explode(lambda x: hl.agg.sum(x), t.arr))
    assert total == 10 * 3
    cnt = t.aggregate(hl.agg.explode(lambda x: hl.agg.count(), t.arr))
    assert cnt == 30


def test_agg_array_agg():
    t = hl.range_table(10)
    res = t.aggregate(hl.agg.array_agg(lambda x: hl.agg.sum(x),
                                       hl.array([t.idx, t.idx * 2, t.idx * 3])))
    assert res == [45, 90, 135]


def test_agg_fold():
    t = hl.range_table(10, 3)
    assert t.aggregate(hl.agg.fold(0, lambda acc: acc + t.idx, lambda a, b: a + b)) == 45


def test_agg_filter_nested_in_group_by():
    t = hl.range_table(20)
    g = t.aggregate(hl.agg.group_by(t.idx % 2,
                                    hl.agg.filter(t.idx > 10, hl.agg.count())))
    assert g[0] == len([i for i in range(20) if i % 2 == 0 and i > 10])


def test_group_rows_by():
    mt = hl.range_matrix_table(10, 4, 2)
    mt = mt.annotate_entries(x=mt.row_idx + mt.col_idx)
    mt = mt.annotate_rows(g=mt.row_idx % 2)
    out = mt.group_rows_by('g').aggregate(s=hl.agg.sum(mt.x), n=hl.agg.count())
    assert out.count() == (2, 4)
    ents = {(e.g, e.col_idx): e for e in out.entries().collect()}
    assert ents[(0, 1)].s == sum(r + 1 for r in range(10) if r % 2 == 0)
    assert ents[(1, 0)].n == 5


def test_group_cols_by():
    mt = hl.range_matrix_table(6, 9)
    mt = mt.annotate_entries(x=1)
    mt = mt.annotate_cols(cg=mt.col_idx % 3)
    out = mt.group_cols_by('cg').aggregate(n=hl.agg.count())
    assert out.count() == (6, 3)
    assert all(e.n == 3 for e in out.entries().collect())


def test_scan_with_filter():
    t = hl.range_table(10, 2)
    t = t.annotate(s=hl.agg.filter(t.idx % 2 == 0, hl.scan.sum(t.idx)))
    rows = t.collect()
    assert [r.s for r in rows] == [sum(j for j in range(i) if j % 2 == 0) for i in range(10)]


def test_scan_full_aggregator_mirror():
    # every hl.agg.* aggregator has an hl.scan.* prefix form
    t = hl.utils.range_table(6, n_partitions=2)
    t = t.annotate(x=t.idx + 1)
    r = t.annotate(s=hl.scan.sum(t.x), p=hl.scan.product(hl.float64(t.x)),
                   st=hl.scan.stats(t.x), tk=hl.scan.take(t.x, 2),
                   fr=hl.scan.fraction(t.x % 2 == 0),
                   cs=hl.scan.collect_as_set(t.x % 3))
    rows = r.collect()
    assert [x.s for x in rows] == [0, 1, 3, 6, 10, 15]
    assert [round(x.p) for x in rows] == [1, 1, 2, 6, 24, 120]
    assert rows[3].st.mean == 2.0 and rows[0].st.n == 0
    assert rows[4].tk == [1, 2]
    import re
    agg_fns = [n for n in dir(hl.agg)
               if not n.startswith('_') and callable(getattr(hl.agg, n))
               and n not in ('Any', 'ApplyBinaryOp', 'IR', 'Optional')]
    missing = [n for n in agg_fns if not hasattr(hl.scan, n)]
    assert missing == [], missing
