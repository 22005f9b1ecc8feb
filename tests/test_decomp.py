"""ops/decomp.py: host/device-split factorizations must match LAPACK."""

import jax.numpy as jnp
import numpy as np
import pytest

from hail_tpu.ops.decomp import chol_qr, gramian_svd, host_svd, randomized_svd


def test_chol_qr_orthonormal():
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.normal(size=(500, 12)))
    Q = chol_qr(Y)
    G = np.asarray(Q.T @ Q)
    np.testing.assert_allclose(G, np.eye(12), atol=1e-10)
    # column span preserved: projection of Y onto Q reproduces Y
    Yh = np.asarray(Y)
    np.testing.assert_allclose(np.asarray(Q) @ (np.asarray(Q).T @ Yh), Yh,
                               atol=1e-8)


def test_chol_qr_rank_deficient():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(200, 3))
    Y = jnp.asarray(np.concatenate([base, base @ rng.normal(size=(3, 5))], axis=1))
    Q = chol_qr(Y)
    assert np.isfinite(np.asarray(Q)).all()
    G = np.asarray(Q.T @ Q)
    # orthonormal on its rank-3 subspace: eigenvalues in {0, 1}
    w = np.linalg.eigvalsh(G)
    assert np.all((np.abs(w) < 1e-6) | (np.abs(w - 1) < 1e-6))


@pytest.mark.parametrize('shape', [(300, 40), (40, 300)])
def test_randomized_svd_matches_lapack(shape):
    rng = np.random.default_rng(2)
    # low effective rank so k=8 captures nearly everything
    A = rng.normal(size=(shape[0], 10)) @ rng.normal(size=(10, shape[1]))
    A = A + 1e-6 * rng.normal(size=shape)
    U, s, Vt = randomized_svd(jnp.asarray(A), k=8, q=3, seed=7)
    s_true = np.linalg.svd(A, compute_uv=False)[:8]
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    # reconstruction
    A8 = np.asarray(U) * s[None, :] @ np.asarray(Vt)
    U_t, s_t, Vt_t = np.linalg.svd(A, full_matrices=False)
    A8_true = U_t[:, :8] * s_t[:8][None, :] @ Vt_t[:8]
    np.testing.assert_allclose(A8, A8_true, atol=1e-5)


@pytest.mark.parametrize('shape', [(120, 30), (30, 120)])
def test_gramian_svd(shape):
    rng = np.random.default_rng(3)
    A = rng.normal(size=shape)
    U, s, Vt = gramian_svd(jnp.asarray(A))
    s_true = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(s, s_true, rtol=1e-8)
    np.testing.assert_allclose((U * s[None, :]) @ Vt, A, atol=1e-8)
    s_only = gramian_svd(jnp.asarray(A), compute_uv=False)
    np.testing.assert_allclose(s_only, s_true, rtol=1e-8)


def test_host_svd_device_input():
    rng = np.random.default_rng(4)
    A = jnp.asarray(rng.normal(size=(50, 20)))
    U, s, Vt = host_svd(A)
    np.testing.assert_allclose((U * s[None, :]) @ Vt, np.asarray(A), atol=1e-10)
