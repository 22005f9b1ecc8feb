"""Linear mixed model: REML fit + per-variant LRT.

The reference removed LinearMixedModel from its Python surface as of 0.2.94
(`hail/python/hail/stats/linear_mixed_model.py` raises NotImplementedError);
this framework implements the historical EMMAX/FaST-LMM formulation the
Scala tier kept (`is/hail/stats/LinearMixedModel.scala`). Tests check the
vectorized device path against the scalar loop, variance-component recovery
on simulated data, and the end-to-end hl.linear_mixed_regression_rows path.
"""

import math

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.stats.linear_mixed_model import LinearMixedModel


def _simulate(n=300, m=180, h2=0.5, seed=0):
    rng = np.random.default_rng(seed)
    Z = rng.integers(0, 3, (n, m)).astype(np.float64)
    Z = (Z - Z.mean(0)) / np.maximum(Z.std(0), 1e-8)
    K = Z @ Z.T / m
    g = rng.multivariate_normal(np.zeros(n), K)
    e = rng.normal(size=n)
    sg = math.sqrt(h2)
    se = math.sqrt(1 - h2)
    X = np.column_stack([np.ones(n), rng.normal(size=n)])
    y = X @ np.array([0.5, -0.2]) + sg * g / g.std() + se * e / e.std()
    return y, X, K, Z


class TestFit:
    def test_h2_recovery_full_rank(self):
        y, X, K, _ = _simulate(h2=0.6, seed=1)
        model = LinearMixedModel.from_kinship(y, X, K)
        model.fit()
        assert model.fitted
        assert 0.3 < model.h_sq < 0.9, model.h_sq
        assert model.sigma_sq > 0 and model.tau_sq > 0

    def test_low_rank_matches_full_rank(self):
        y, X, K, Z = _simulate(n=120, m=60, h2=0.5, seed=2)
        full = LinearMixedModel.from_kinship(y, X, K)
        full.fit()
        low = LinearMixedModel.from_random_effects(y, X, Z)
        low.fit()
        assert abs(full.h_sq - low.h_sq) < 0.02
        np.testing.assert_allclose(full.beta, low.beta, atol=1e-4)

    def test_compute_neg_log_reml_minimum_at_fit(self):
        y, X, K, _ = _simulate(seed=3)
        model = LinearMixedModel.from_kinship(y, X, K)
        model.fit()
        at_opt = model.compute_neg_log_reml(model.log_gamma)
        for dlg in (-0.5, 0.5):
            assert model.compute_neg_log_reml(model.log_gamma + dlg) >= at_opt - 1e-9

    def test_h_sq_standard_error_and_lkhd(self):
        y, X, K, _ = _simulate(seed=4)
        model = LinearMixedModel.from_kinship(y, X, K)
        model.fit()
        se = model.h_sq_standard_error
        assert se is None or 0 < se < 1
        lk = model.h_sq_normalized_lkhd()
        assert lk.shape == (101,) and abs(lk.sum() - 1) < 1e-12
        # likelihood should peak near the fitted h²
        hs = np.linspace(0.01, 0.99, 101)
        assert abs(hs[np.argmax(lk)] - model.h_sq) < 0.15


class TestAlternatives:
    def test_batched_matches_scalar_loop(self):
        y, X, K, _ = _simulate(n=150, seed=5)
        model = LinearMixedModel.from_kinship(y, X, K)
        model.fit()
        rng = np.random.default_rng(6)
        G = rng.integers(0, 3, (150, 40)).astype(np.float64)
        pa = model._u.T @ G
        loop = model.fit_alternatives_numpy(pa)
        batched = model.fit_alternatives_batched(pa)
        np.testing.assert_allclose(batched['beta'], loop['beta'], rtol=1e-8)
        np.testing.assert_allclose(batched['chi_sq'], loop['chi_sq'],
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(batched['p_value'], loop['p_value'],
                                   rtol=1e-6, atol=1e-12)

    def test_causal_variant_detected(self):
        rng = np.random.default_rng(7)
        n, m = 250, 120
        Z = rng.integers(0, 3, (n, m)).astype(np.float64)
        K = ((Z - Z.mean(0)) / np.maximum(Z.std(0), 1e-8))
        K = K @ K.T / m
        causal = rng.integers(0, 3, n).astype(np.float64)
        y = 0.8 * causal + rng.normal(size=n)
        X = np.ones((n, 1))
        model = LinearMixedModel.from_kinship(y, X, K)
        model.fit()
        G = np.column_stack([causal] + [rng.integers(0, 3, n).astype(np.float64)
                                        for _ in range(20)])
        res = model.fit_alternatives_batched(model._u.T @ G)
        assert res['p_value'][0] < 1e-6
        assert np.median(res['p_value'][1:]) > 0.01


class TestEndToEnd:
    def test_linear_mixed_regression_rows(self):
        mt = hl.balding_nichols_model(2, 120, 80)
        mt = mt.annotate_cols(pheno=hl.rand_norm(seed=9))
        model, _ = hl.linear_mixed_model(
            y=mt.pheno, x=[1.0], z_t=mt.GT.n_alt_alleles())
        model.fit()
        assert model.fitted
        t = hl.linear_mixed_regression_rows(mt.GT.n_alt_alleles(), model)
        rows = t.collect()
        assert len(rows) == 80
        finite = [r for r in rows if r.p_value is not None
                  and not math.isnan(r.p_value)]
        assert len(finite) > 60
        assert all(0 <= r.p_value <= 1 for r in finite)
