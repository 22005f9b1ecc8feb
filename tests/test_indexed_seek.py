"""Indexed seeks: _intervals plan-time partition restriction + point-query
partition pruning (round-2 verdict item 3)."""

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.utils.structs import Interval, Struct


def test_read_table_intervals_partitions(tmp_path):
    t = hl.utils.range_table(2000, 10)
    path = str(tmp_path / 't.ht')
    t.write(path)
    t2 = hl.read_table(path, _intervals=[
        Interval(Struct(idx=150), Struct(idx=250), True, False),
        Interval(Struct(idx=250), Struct(idx=500), True, False),
    ])
    assert t2.n_partitions() == 2
    assert t2.count() == 350


def test_read_table_filter_intervals_partitions(tmp_path):
    t = hl.utils.range_table(2000, 10)
    path = str(tmp_path / 't.ht')
    t.write(path)
    t2 = hl.read_table(path, _intervals=[
        Interval(Struct(idx=150), Struct(idx=500), True, False),
    ], _filter_intervals=True)
    # rows 150..500 live in source partitions [0], [1], [2] (200/part)
    assert t2.n_partitions() == 3
    assert t2.count() == 350


def test_point_query_touches_one_partition(tmp_path):
    t = hl.utils.range_table(10000, 10)
    path = str(tmp_path / 'big.ht')
    t.write(path)

    t_read = hl.read_table(path)
    st = t_read._stage
    calls = []
    orig_pf = st.partition_fn

    def counting_pf(ctx):
        calls.append(ctx)
        return orig_pf(ctx)

    st.partition_fn = counting_pf
    from hail_tpu.io.native import _query_keyed_rows
    hits = _query_keyed_rows(t_read, 4321)
    assert [r for r in hits]
    # the stored per-partition key bounds restrict the scan to ONE partition
    assert len(calls) == 1
    (i, r), = hits
    batch = orig_pf(st.contexts[i])
    assert batch.columns['idx'].to_pylist()[r] == 4321


def test_query_table_values(tmp_path):
    t = hl.utils.range_table(1000, 5)
    t = t.annotate(sq=t.idx * t.idx)
    path = str(tmp_path / 'q.ht')
    t.write(path)
    rows = hl.eval(hl.query_table(path, 77))
    assert len(rows) == 1 and rows[0].sq == 77 * 77
