"""Device GLM tier vs the host-faithful port (stats/glmfit.py).

The contract (ops/glm_device.py docstring): per-variant n_iterations /
converged / exploded match EXACTLY; numeric outputs match to float
reassociation noise. glmfit is itself operation-for-operation the
reference's lowered loops (reference statgen.py:1041,1191,1852), so
equality here is equality with the reference.
"""

import numpy as np
import pytest

from hail_tpu.stats import glmfit
from hail_tpu.ops import glm_device


def _dataset(seed=0, N=400, R=40, k=3, missing_frac=0.05, binary=True):
    rng = np.random.RandomState(seed)
    Cov = np.hstack([np.ones((N, 1)), rng.randn(N, k - 1)])
    beta_true = rng.randn(k) * 0.4
    G = rng.binomial(2, 0.3, size=(R, N)).astype(np.float64)
    M = rng.rand(R, N) < missing_frac
    eta = Cov @ beta_true + 0.15 * np.where(M, 0, G).mean(axis=0)
    if binary:
        y = (rng.rand(N) < 1 / (1 + np.exp(-eta))).astype(np.float64)
    else:
        y = rng.poisson(np.exp(np.clip(eta, -3, 2))).astype(np.float64)
    return Cov, y, G, M


def _impute(G, M):
    with np.errstate(invalid='ignore', divide='ignore'):
        cnt = (~M).sum(axis=1)
        mean = np.where(M, 0.0, G).sum(axis=1) / cnt
    return np.where(M, mean[:, None], G)


MAXIT, TOL = 25, 1e-8


@pytest.fixture(scope='module')
def logistic_data():
    Cov, y, G, M = _dataset(seed=1)
    null = glmfit.logreg_fit(Cov, y, None, MAXIT, TOL)
    assert null['converged']
    return Cov, y, G, M, null


def _host_fit_rows(Cov, y, G, M, null):
    Gi = _impute(G, M)
    fits = []
    for r in range(G.shape[0]):
        X = np.hstack([Cov, Gi[r][:, None]])
        fits.append((X, glmfit.logreg_fit(X, y, null, MAXIT, TOL)))
    return fits


def test_newton_matches_host_per_variant(logistic_data):
    Cov, y, G, M, null = logistic_data
    dev = glm_device.logistic_rows_device(G, M, Cov, y, null, 'wald',
                                          MAXIT, TOL)
    host = _host_fit_rows(Cov, y, G, M, null)
    for r, (X, hf) in enumerate(host):
        assert int(dev['n_iter'][r]) == hf['n_iterations'], f'row {r}'
        assert (dev['status'][r] == 1) == hf['converged'], f'row {r}'
        assert (dev['status'][r] == 2) == hf['exploded'], f'row {r}'
        if hf['converged']:
            np.testing.assert_allclose(dev['b'][r], hf['b'], rtol=1e-10,
                                       atol=1e-12)
            np.testing.assert_allclose(dev['ll'][r], hf['log_lkhd'],
                                       rtol=1e-10)
            w = glmfit.wald_test(X, hf)
            np.testing.assert_allclose(dev['se'][r], w['standard_error'],
                                       rtol=1e-9)
            np.testing.assert_allclose(dev['z'][r], w['z_stat'], rtol=1e-9)


def test_score_matches_host(logistic_data):
    Cov, y, G, M, null = logistic_data
    Gi = _impute(G, M)
    dev = glm_device.logistic_rows_device(G, M, Cov, y, null, 'score',
                                          MAXIT, TOL)
    for r in range(G.shape[0]):
        X = np.hstack([Cov, Gi[r][:, None]])
        h = glmfit.logistic_score_test(X, y, null)
        if h['chi_sq_stat'] is None:
            assert not dev['valid'][r]
        else:
            np.testing.assert_allclose(dev['chi_sq_stat'][r], h['chi_sq_stat'],
                                       rtol=1e-9, atol=1e-12)


def test_firth_matches_host(logistic_data):
    Cov, y, G, M, null = logistic_data
    Gi = _impute(G, M)
    dev = glm_device.logistic_rows_device(G, M, Cov, y, null, 'firth',
                                          MAXIT, TOL)
    for r in range(G.shape[0]):
        X = np.hstack([Cov, Gi[r][:, None]])
        hn = glmfit.firth_fit(null['b'], X, y, MAXIT, TOL)
        assert int(dev['null_n_iter'][r]) == hn['n_iterations'], f'row {r}'
        assert (dev['null_status'][r] == 1) == hn['converged'], f'row {r}'
        if not hn['converged']:
            continue
        np.testing.assert_allclose(dev['null_b'][r], hn['b'], rtol=1e-9,
                                   atol=1e-11)
        np.testing.assert_allclose(dev['null_ll'][r], hn['log_lkhd'],
                                   rtol=1e-9)
        hf = glmfit.firth_fit(np.concatenate([hn['b'], [0.0]]), X, y,
                              MAXIT, TOL)
        assert int(dev['full_n_iter'][r]) == hf['n_iterations'], f'row {r}'
        assert (dev['full_status'][r] == 1) == hf['converged'], f'row {r}'
        if hf['converged']:
            np.testing.assert_allclose(dev['full_b'][r], hf['b'], rtol=1e-9,
                                       atol=1e-11)
            np.testing.assert_allclose(dev['full_ll'][r], hf['log_lkhd'],
                                       rtol=1e-9)


def test_poisson_matches_host():
    Cov, y, G, M = _dataset(seed=3, binary=False)
    N, k = Cov.shape
    logmean = float(np.log(y.sum() / N))
    b0 = np.concatenate([[logmean], np.zeros(k - 1)])
    mu0 = np.exp(Cov @ b0)
    null = glmfit.poisson_fit(Cov, y, b0, mu0, Cov.T @ (y - mu0),
                              (mu0 * Cov.T) @ Cov, MAXIT, TOL)
    assert null['converged']
    Gi = _impute(G, M)
    dev = glm_device.poisson_rows_device(G, M, Cov, y, null, 'wald',
                                         MAXIT, TOL)
    devs = glm_device.poisson_rows_device(G, M, Cov, y, null, 'score',
                                          MAXIT, TOL)

    def _sigmoid(v):
        with np.errstate(over='ignore'):
            return 1.0 / (1.0 + np.exp(-v))

    for r in range(G.shape[0]):
        X = np.hstack([Cov, Gi[r][:, None]])
        b = np.concatenate([null['b'], [0.0]])
        mu = _sigmoid(X @ b)   # the reference wald/lrt prelude quirk
        score = np.concatenate([null['score'], [Gi[r] @ (y - mu)]])
        f01 = ((Cov.T * mu) @ Gi[r]).reshape(-1, 1)
        f11 = np.array([[(mu * Gi[r]) @ Gi[r]]])
        fisher = np.block([[null['fisher'], f01], [f01.T, f11]])
        hf = glmfit.poisson_fit(X, y, b, mu, score, fisher, MAXIT, TOL)
        assert int(dev['n_iter'][r]) == hf['n_iterations'], f'row {r}'
        assert (dev['status'][r] == 1) == hf['converged'], f'row {r}'
        if hf['converged']:
            np.testing.assert_allclose(dev['b'][r], hf['b'], rtol=1e-10,
                                       atol=1e-12)
            np.testing.assert_allclose(dev['ll'][r], hf['log_lkhd'],
                                       rtol=1e-10)
        hs = glmfit.poisson_score_test(null, Cov, y, Gi[r])
        if hs['chi_sq_stat'] is None:
            assert not devs['valid'][r]
        else:
            np.testing.assert_allclose(devs['chi_sq_stat'][r],
                                       hs['chi_sq_stat'], rtol=1e-9)


def test_all_missing_row_explodes(logistic_data):
    Cov, y, G, M, null = logistic_data
    G2 = G.copy()
    M2 = M.copy()
    M2[5, :] = True          # all-missing → NaN imputation → exploded
    dev = glm_device.logistic_rows_device(G2, M2, Cov, y, null, 'wald',
                                          MAXIT, TOL)
    Gi = _impute(G2, M2)
    X = np.hstack([Cov, Gi[5][:, None]])
    hf = glmfit.logreg_fit(X, y, null, MAXIT, TOL)
    assert hf['exploded']
    assert dev['status'][5] == 2
    assert int(dev['n_iter'][5]) == hf['n_iterations']
