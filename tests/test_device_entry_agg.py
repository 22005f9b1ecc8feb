"""Device entry-aggregation tier (ops/entry_agg.py): parity with the host
evaluator across aggregators/missingness, fallback correctness, and a fused
throughput check (round-2 verdict item 9)."""

import os
import time

import numpy as np
import pytest

import hail_tpu as hl


def _host(mt, expr):
    os.environ['HAIL_TPU_NO_DEVICE_AGG'] = '1'
    try:
        return mt.aggregate_entries(expr)
    finally:
        del os.environ['HAIL_TPU_NO_DEVICE_AGG']


@pytest.fixture(scope='module')
def mt():
    mt = hl.balding_nichols_model(2, 40, 60, n_partitions=4)
    mt = mt.annotate_entries(x=mt.GT.n_alt_alleles() * 2 + 1)
    return mt


def test_parity_sum_count_stats(mt):
    for expr_f in [
        lambda m: hl.agg.sum(m.x),
        lambda m: hl.agg.sum(m.GT.n_alt_alleles()),
        lambda m: hl.agg.count(),
        lambda m: hl.agg.count_where(m.x > 2),
        lambda m: hl.agg.mean(m.x),
        lambda m: hl.agg.stats(m.GT.n_alt_alleles()),
        lambda m: hl.agg.min(m.x),
        lambda m: hl.agg.max(m.x),
        lambda m: hl.agg.fraction(m.GT.n_alt_alleles() == 1),
        lambda m: hl.agg.filter(m.x > 1, hl.agg.sum(m.GT.n_alt_alleles())),
    ]:
        assert mt.aggregate_entries(expr_f(mt)) == _host(mt, expr_f(mt)), expr_f


def test_parity_with_missing():
    mt = hl.balding_nichols_model(1, 10, 20, n_partitions=2)
    mt = mt.annotate_entries(
        y=hl.if_else(mt.GT.n_alt_alleles() == 1, hl.missing(hl.tint32),
                     mt.GT.n_alt_alleles()))
    for expr_f in [lambda m: hl.agg.sum(m.y), lambda m: hl.agg.mean(m.y),
                   lambda m: hl.agg.count_where(hl.is_missing(m.y)),
                   lambda m: hl.agg.stats(m.y)]:
        assert mt.aggregate_entries(expr_f(mt)) == _host(mt, expr_f(mt))


def test_parity_filtered_entries():
    mt = hl.balding_nichols_model(1, 10, 20, n_partitions=2)
    mt = mt.filter_entries(mt.GT.n_alt_alleles() < 2)
    assert mt.aggregate_entries(hl.agg.count()) == _host(mt, hl.agg.count())
    assert mt.aggregate_entries(hl.agg.sum(mt.GT.n_alt_alleles())) == \
        _host(mt, hl.agg.sum(mt.GT.n_alt_alleles()))


def test_unsupported_falls_back(mt):
    # collect is not in the device tier: must produce the host result
    out = mt.aggregate_entries(hl.agg.collect(mt.x))
    assert len(out) == 40 * 60


def test_fused_throughput():
    """The fused jit path beats the host expression evaluator on a large
    aggregate whose expression is computed inside the aggregation."""
    rng = np.random.default_rng(0)
    mt = hl.balding_nichols_model(1, 400, 2000, n_partitions=2)
    expr = hl.agg.sum(mt.GT.n_alt_alleles() * 2 + 1)
    # warm both paths
    v1 = mt.aggregate_entries(expr)
    v2 = _host(mt, expr)
    assert v1 == v2
    t0 = time.time()
    for _ in range(3):
        mt.aggregate_entries(expr)
    dev = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        _host(mt, expr)
    host = time.time() - t0
    # the partitions are memoized so both paths time pure compute
    assert dev < host * 1.2, (dev, host)
