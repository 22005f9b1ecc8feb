"""Device-tier distributed sort (ops/device_sort.py) wired into
Table.order_by: shard_map + lax.all_to_all range exchange on the virtual
8-device CPU mesh, parity vs the host sample-pivot tier.

Reference contract: LowerDistributedSort.scala:161,320-464 (sample pivots,
range partition, local sort; stable total order)."""

import numpy as np
import pytest

import hail_tpu as hl


@pytest.fixture(autouse=True)
def _init():
    hl.init(global_seed=0)
    yield


def _with_flag(value):
    from hail_tpu.context import Env
    Env.hc().flags['use_device_sort'] = value


def _mk_table(n=1000, n_parts=7, dtype='int'):
    rng = np.random.default_rng(5)
    t = hl.utils.range_table(n, n_partitions=n_parts)
    if dtype == 'int':
        t = t.annotate(k=hl.int32((t.idx * 2654435761) % 10007 - 5000))
    else:
        t = t.annotate(k=(hl.float64(t.idx) * 0.37) % 11.0 - 5.0)
    return t


@pytest.mark.parametrize('dtype', ['int', 'float'])
@pytest.mark.parametrize('asc', [True, False])
def test_device_sort_matches_host(dtype, asc):
    t = _mk_table(dtype=dtype)
    key = t.k if asc else hl.desc(t.k)
    _with_flag('1')
    dev = t.order_by(key).collect()
    _with_flag('0')
    host = t.order_by(key).collect()
    _with_flag('1')
    assert [r.idx for r in dev] == [r.idx for r in host]
    ks = [r.k for r in dev]
    assert ks == sorted(ks, reverse=not asc)


def test_device_sort_engages():
    """The device tier must actually run on the multi-device mesh for a
    single numeric key (else this test guards against silent fallback)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device mesh')
    from hail_tpu.ops.device_sort import device_range_sort
    keys = np.random.default_rng(0).permutation(500).astype(np.int64)
    order = device_range_sort(keys, True)
    assert order is not None
    np.testing.assert_array_equal(keys[order], np.sort(keys))


def test_device_sort_stability_ties():
    """Rows with equal keys keep input order (stable), identical to host."""
    t = hl.utils.range_table(400, n_partitions=5)
    t = t.annotate(k=t.idx % 7)
    _with_flag('1')
    dev = [r.idx for r in t.order_by(t.k).collect()]
    _with_flag('0')
    host = [r.idx for r in t.order_by(t.k).collect()]
    _with_flag('1')
    assert dev == host
    # within each key the idx order is ascending (stability)
    byk = {}
    tt = t.order_by(t.k).collect()
    for r in tt:
        byk.setdefault(r.k, []).append(r.idx)
    for ids in byk.values():
        assert ids == sorted(ids)


def test_device_sort_fallbacks():
    """Missing keys, NaNs, multi-key, and string keys fall back to host."""
    from hail_tpu.ops.device_sort import device_range_sort
    nan_keys = np.array([1.0, np.nan, 3.0] * 50)
    assert device_range_sort(nan_keys, True) is None

    t = hl.utils.range_table(100, n_partitions=4)
    t = t.annotate(k=hl.if_else(t.idx % 10 == 0, hl.missing('int32'), t.idx))
    res = t.order_by(t.k).collect()           # missing sorts — host tier
    assert len(res) == 100
    t2 = hl.utils.range_table(50, n_partitions=3)
    t2 = t2.annotate(a=t2.idx % 3, b=-t2.idx)
    res2 = [(r.a, r.b) for r in t2.order_by(t2.a, t2.b).collect()]
    assert res2 == sorted(res2)
