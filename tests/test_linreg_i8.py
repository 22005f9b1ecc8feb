"""int8 fast-path linreg: pallas (interpret) vs jnp reference vs f64 kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from hail_tpu.ops.linreg_i8 import linreg_block_i8, linreg_stats_i8
from hail_tpu.ops.regression import linreg_block


def _make(R=100, N=300, K=3, P=2, miss_rate=0.05, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.integers(0, 3, (R, N)).astype(np.int8)
    miss = rng.random((R, N)) < miss_rate
    G8 = np.where(miss, -1, G).astype(np.int8)
    cov = np.concatenate([np.ones((N, 1)), rng.normal(size=(N, K - 1))], axis=1)
    Q, _ = np.linalg.qr(cov)
    y = rng.normal(size=(N, P))
    Qty = Q.T @ y
    yyp = (y * y).sum(axis=0) - (Qty * Qty).sum(axis=0)
    dof = N - K - 1
    return G8, miss, Q, y, Qty, yyp, dof


def test_i8_matches_f64_kernel():
    G8, miss, Q, Ys, Qty, yyp, dof = _make()
    W = np.concatenate([Q, Ys], axis=1)
    out8 = linreg_block_i8(jnp.asarray(G8), jnp.asarray(W, np.float32),
                           jnp.asarray(Qty), jnp.asarray(yyp),
                           jnp.asarray(float(dof)), Q.shape[1],
                           use_pallas=False)
    Gf = np.where(miss, 0.0, G8).astype(np.float64)
    ones = jnp.ones(Gf.shape[1])
    out64 = linreg_block(jnp.asarray(Gf), jnp.asarray(miss), ones,
                         jnp.asarray(Q), jnp.asarray(Ys), jnp.asarray(Qty),
                         jnp.asarray(yyp), jnp.asarray(float(dof)))
    # sum_x, ytx, beta, se, t
    np.testing.assert_allclose(np.asarray(out8[0]), np.asarray(out64[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out8[1]), np.asarray(out64[1]),
                               rtol=1e-5, atol=1e-4)
    for i, rtol in ((2, 2e-4), (3, 2e-4), (4, 2e-4)):
        np.testing.assert_allclose(np.asarray(out8[i]), np.asarray(out64[i]),
                                   rtol=rtol, atol=1e-4)


def test_pallas_interpret_matches_ref():
    G8, _, Q, Ys, Qty, yyp, dof = _make(R=64, N=256, K=2, P=1, seed=1)
    W = jnp.asarray(np.concatenate([Q, Ys], axis=1), jnp.float32)
    a = linreg_block_i8(jnp.asarray(G8), W, jnp.asarray(Qty), jnp.asarray(yyp),
                        jnp.asarray(float(dof)), Q.shape[1],
                        use_pallas=True, interpret=True)
    b = linreg_block_i8(jnp.asarray(G8), W, jnp.asarray(Qty), jnp.asarray(yyp),
                        jnp.asarray(float(dof)), Q.shape[1],
                        use_pallas=False)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_unpadded_shapes():
    # R, N not multiples of the tiles
    G8, _, Q, Ys, Qty, yyp, dof = _make(R=77, N=333, K=2, P=1, seed=2)
    W = jnp.asarray(np.concatenate([Q, Ys], axis=1), jnp.float32)
    out = linreg_block_i8(jnp.asarray(G8), W, jnp.asarray(Qty),
                          jnp.asarray(yyp), jnp.asarray(float(dof)),
                          Q.shape[1], use_pallas=False)
    assert out[2].shape == (77, 1)
    assert np.isfinite(np.asarray(out[2])).all()


def test_all_missing_row_nan():
    # reference nd semantics: an all-missing row mean-imputes NaN → NaN stats
    G8, _, Q, Ys, Qty, yyp, dof = _make(R=8, N=64, K=2, P=1, seed=3)
    G8[0, :] = -1
    out = linreg_stats_i8(G8, Q, Ys, Qty, yyp, dof)
    assert np.isnan(out['beta'][0, 0])
    assert np.isfinite(out['beta'][1:]).all()


def test_stats_wrapper_pvalues():
    G8, miss, Q, Ys, Qty, yyp, dof = _make(seed=4)
    from hail_tpu.ops.regression import linreg_stats
    res8 = linreg_stats_i8(G8, Q, Ys, Qty, yyp, dof)
    Gf = np.where(miss, 0.0, G8).astype(np.float64)
    res64 = linreg_stats(Gf, miss, None, Q, Ys, Qty, yyp, dof)
    np.testing.assert_allclose(res8['beta'], res64['beta'],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(res8['p_value'], res64['p_value'],
                               rtol=1e-3, atol=1e-6)
