"""BlockMatrix storage must be sharded across the mesh at rest
(round-1 verdict item 2), with per-device shards a fraction of the matrix."""

import jax
import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.linalg import BlockMatrix
from hail_tpu.parallel.mesh import get_mesh, pick_2d_spec


def n_dev():
    return len(jax.devices())


def test_random_is_sharded_at_rest():
    bm = BlockMatrix.random(512, 512, seed=0)
    assert len(bm._data.sharding.device_set) == n_dev()
    shard_rows = {s.data.shape for s in bm._data.addressable_shards}
    total = 512 * 512
    for shp in shard_rows:
        assert shp[0] * shp[1] <= total // n_dev()


def test_elementwise_stays_sharded():
    a = BlockMatrix.random(256, 512, seed=1)
    b = BlockMatrix.random(256, 512, seed=2)
    c = (a + b) * 2.0 - a
    assert len(c._data.sharding.device_set) == n_dev()
    np.testing.assert_allclose(c.to_numpy(),
                               np.asarray(a._data) + 2 * np.asarray(b._data) - 0.0
                               - np.asarray(a._data) + np.asarray(a._data),
                               rtol=1e-12)


def test_sparsify_stays_sharded():
    a = BlockMatrix.random(256, 256, seed=3)
    s = a.sparsify_triangle()
    assert len(s._data.sharding.device_set) == n_dev()
    arr = s.to_numpy()
    assert np.allclose(arr, np.triu(np.asarray(a._data)))


def test_matmul_sharded_output():
    a = BlockMatrix.random(256, 128, seed=4)
    b = BlockMatrix.random(128, 256, seed=5)
    c = a @ b
    np.testing.assert_allclose(c.to_numpy(),
                               np.asarray(a._data) @ np.asarray(b._data),
                               rtol=1e-10)
    assert len(c._data.sharding.device_set) == n_dev()


def test_uneven_shapes_fall_back_gracefully():
    bm = BlockMatrix.from_numpy(np.arange(21.0).reshape(3, 7))
    np.testing.assert_allclose(bm.to_numpy(), np.arange(21.0).reshape(3, 7))
    c = bm @ bm.T
    np.testing.assert_allclose(
        c.to_numpy(),
        np.arange(21.0).reshape(3, 7) @ np.arange(21.0).reshape(3, 7).T)


def test_pick_2d_spec_prefers_grid():
    mesh = get_mesh()
    mx, my = mesh.devices.shape
    assert pick_2d_spec((mx * 4, my * 4), mesh) == jax.sharding.PartitionSpec('x', 'y')
    # a prime-sized matrix stays replicated rather than erroring
    assert pick_2d_spec((7, 11), mesh) is not None


def test_from_entry_expr_sharded_no_host_concat(sample_mt):
    bm = BlockMatrix.from_entry_expr(sample_mt.GT.n_alt_alleles(),
                                     mean_impute=True)
    assert bm.shape == (346, 100)
    # parity with the all-at-once host path
    from hail_tpu.methods.statgen import _entry_expr_to_blocks
    G, M = _entry_expr_to_blocks(sample_mt.GT.n_alt_alleles())
    cnt = (~M).sum(axis=1)
    s = np.where(M, 0, G).sum(axis=1)
    mean = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    G = np.where(M, mean[:, None], G)
    np.testing.assert_allclose(bm.to_numpy(), G, rtol=1e-12)


def test_grm_is_sharded(sample_mt):
    grm = hl.genetic_relatedness_matrix(sample_mt.GT)
    assert grm.shape == (100, 100)
    if n_dev() > 1:
        assert len(grm._data.sharding.device_set) > 1
    arr = grm.to_numpy()
    np.testing.assert_allclose(arr, arr.T, atol=1e-10)
