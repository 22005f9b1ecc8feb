"""Batched d2h fetch groups (ops/fetchgroup.py) + the 2-bit GT wire format
(ops/linreg_i8.py pack_gt_2bit/unpack_gt_2bit) + deferred result columns.

Reference contract: the driver decodes all partitions' result bytes in one
pass (Backend.scala:28-47); the packed-call bit layout is variant/Call.scala.
"""

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.ir import columns as C
from hail_tpu import types as ht
from hail_tpu.ops import fetchgroup


def test_pack_unpack_2bit_parity():
    import jax.numpy as jnp
    from hail_tpu.genetics.call import pack_diploid
    from hail_tpu.ops.linreg_i8 import (decode_packed_gt, pack_gt_2bit,
                                        unpack_gt_2bit)
    rng = np.random.default_rng(0)
    for N in (16, 1003, 4):          # multiple-of-4 and ragged widths
        R = 32
        nalt = rng.integers(0, 3, (R, N)).astype(np.int32)
        miss = rng.random((R, N)) < 0.07
        gt = pack_diploid((nalt == 2).astype(np.int32),
                          (nalt >= 1).astype(np.int32))
        u8 = pack_gt_2bit(gt, miss)
        assert u8.nbytes == R * (-(-N // 4))
        gz8, m8 = unpack_gt_2bit(jnp.asarray(u8), N)
        gz8r, m8r = decode_packed_gt(jnp.asarray(gt), jnp.asarray(miss))
        np.testing.assert_array_equal(np.asarray(gz8), np.asarray(gz8r))
        np.testing.assert_array_equal(np.asarray(m8), np.asarray(m8r))


def test_pack_2bit_no_missing_mask():
    from hail_tpu.genetics.call import pack_diploid
    from hail_tpu.ops.linreg_i8 import pack_gt_2bit
    gt = pack_diploid(np.zeros((2, 4), np.int32), np.ones((2, 4), np.int32))
    u8 = pack_gt_2bit(gt, None)
    assert u8.shape == (2, 1)
    assert (np.unpackbits(u8) is not None)


def test_fetchgroup_single_flush():
    import jax.numpy as jnp
    a = jnp.arange(12, dtype=jnp.float64).reshape(4, 3)
    b = jnp.arange(6, dtype=jnp.float64).reshape(2, 3) + 100
    c = jnp.arange(4, dtype=jnp.float32)            # different dtype group
    s1, s2, s3 = fetchgroup.defer(a), fetchgroup.defer(b), fetchgroup.defer(c)
    assert fetchgroup.pending_count() == 3
    fetchgroup.flush()
    assert fetchgroup.pending_count() == 0
    np.testing.assert_array_equal(s1.get(), np.arange(12.).reshape(4, 3))
    np.testing.assert_array_equal(s2.get(), np.arange(6.).reshape(2, 3) + 100)
    np.testing.assert_array_equal(s3.get(), np.arange(4, dtype=np.float32))


def test_slot_get_triggers_flush():
    import jax.numpy as jnp
    s = fetchgroup.defer(jnp.ones((3, 2)))
    np.testing.assert_array_equal(s.get(), np.ones((3, 2)))
    assert fetchgroup.pending_count() == 0


def test_deferred_primitive_column():
    import jax.numpy as jnp
    slot = fetchgroup.defer(jnp.asarray(np.arange(10.).reshape(5, 2)))
    col = C.DeferredPrimitiveColumn(
        ht.tfloat64, 5, slot, lambda a: (a[:, 1], None))
    assert isinstance(col, C.PrimitiveColumn)
    assert col.shape == (5,)
    np.testing.assert_array_equal(col.values, np.arange(10.).reshape(5, 2)[:, 1])
    assert col.missing is None
    g = col.gather(np.array([2, 0]))
    np.testing.assert_array_equal(g.values, [5.0, 1.0])


def test_lazy_transfer_keeps_live_slots_fetchable():
    """Under lazy_transfer, stage_end waits for compute but does not
    transfer; a slot someone still holds resolves on first read, a slot
    nobody holds is dropped (its device buffer freed)."""
    import jax.numpy as jnp
    held = fetchgroup.defer(jnp.arange(6, dtype=jnp.float64) * 2)
    dropped = fetchgroup.defer(jnp.ones(4))
    with fetchgroup.lazy_transfer():
        fetchgroup.stage_end()
    assert held.host is None            # not transferred yet
    del dropped
    assert fetchgroup.pending_count() == 1
    np.testing.assert_array_equal(held.get(), np.arange(6.) * 2)
    assert fetchgroup.pending_count() == 0


def test_force_count_then_collect_still_correct():
    """_force_count (lazy transfer) must not corrupt a later collect of the
    same pipeline's results."""
    hl.init(global_seed=12)
    mt = hl.balding_nichols_model(2, 50, 30)
    mt = mt.annotate_cols(p1=hl.rand_norm(seed=5))
    ht_res = hl.linear_regression_rows(
        y=mt.p1, x=mt.GT.n_alt_alleles(), covariates=[1.0])
    assert ht_res._force_count() == 30
    rows = ht_res.collect()
    assert len(rows) == 30
    assert any(np.isfinite(r.beta) for r in rows)


def test_linreg_deferred_matches_eager_chained():
    """The deferred single-pheno path must agree with the multi-pheno
    (eager) path on the same data."""
    hl.init(global_seed=11)
    mt = hl.balding_nichols_model(2, 60, 40)
    mt = mt.annotate_cols(p1=hl.rand_norm(seed=3))
    single = hl.linear_regression_rows(
        y=mt.p1, x=mt.GT.n_alt_alleles(), covariates=[1.0])
    multi = hl.linear_regression_rows(
        y=[mt.p1], x=mt.GT.n_alt_alleles(), covariates=[1.0])
    s = single.collect()
    m = multi.collect()
    assert len(s) == len(m) == 40
    for rs, rm in zip(s, m):
        assert rs.beta == pytest.approx(rm.beta[0], abs=0, rel=0), \
            (rs.beta, rm.beta)
        assert rs.p_value == pytest.approx(rm.p_value[0], abs=0, rel=0)
