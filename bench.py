"""North-star benchmark: linreg GWAS variants/sec/chip (BASELINE.json).

Measures the production path end-to-end per block: stage a (BLOCK_R × N)
dosage block to the device, run the batched per-variant OLS kernel
(hail_tpu.ops.regression.linreg_stats — the parity-true f64 path), and fetch
the per-variant statistics back to the host. Distinct data per block; the
fetch forces real execution (the axon relay executes lazily, so
block_until_ready alone under-measures).

vs_baseline is the speedup over the identical computation in host numpy
(f64 BLAS) — the reference's execution substrate is CPU BLAS and it publishes
no absolute numbers (BASELINE.md), so measured host throughput is the
baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def numpy_linreg_block(G, missing, Q, y_r, yty_r, d):
    cnt = (~missing).sum(axis=1)
    s = np.where(missing, 0.0, G).sum(axis=1)
    mean = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    Gi = np.where(missing, mean[:, None], G)
    GQ = Gi @ Q
    Gy = Gi @ y_r
    gg = np.maximum((Gi * Gi).sum(axis=1) - (GQ * GQ).sum(axis=1), 0.0)
    beta = Gy / gg[:, None]
    se2 = (yty_r[None, :] / gg[:, None] - beta * beta) / d
    return beta, np.sqrt(np.maximum(se2, 0.0)), cnt


def main():
    import jax
    import jax.numpy as jnp
    import hail_tpu as hl
    hl.init()
    from hail_tpu.ops.regression import linreg_stats

    N = 10_000          # samples (BASELINE: 10k-sample GWAS)
    BLOCK_R = 4096      # variants per block
    K = 4               # covariates incl. intercept

    rng = np.random.default_rng(0)
    cov = np.concatenate([np.ones((N, 1)), rng.normal(size=(N, K - 1))], axis=1)
    Q, _ = np.linalg.qr(cov)
    y = rng.normal(size=(N, 1))
    y_r = y - Q @ (Q.T @ y)
    yty_r = (y_r * y_r).sum(axis=0)
    dof = N - K - 1

    n_blocks = 4
    hosts = [(rng.integers(0, 3, (BLOCK_R, N)).astype(np.float64),
              rng.random((BLOCK_R, N)) < 0.02) for _ in range(n_blocks)]

    # warmup / compile on block 0
    res = linreg_stats(hosts[0][0], hosts[0][1], Q, y_r, yty_r, dof)
    assert np.isfinite(res['beta']).all()

    t0 = time.time()
    acc = 0.0
    for (G, M) in hosts:
        res = linreg_stats(G, M, Q, y_r, yty_r, dof)
        acc += float(res['beta'].sum())
    dt = time.time() - t0
    variants_per_sec = BLOCK_R * n_blocks / dt

    # host-numpy baseline (same computation + stats, f64 BLAS)
    import scipy.stats as st
    t0 = time.time()
    for (G, M) in hosts[:2]:
        beta, se, cnt = numpy_linreg_block(G, M, Q, y_r, yty_r, dof)
        with np.errstate(all='ignore'):
            p = 2 * st.t.sf(np.abs(beta / se), dof)
    base_dt = time.time() - t0
    base_vps = BLOCK_R * 2 / base_dt

    print(json.dumps({
        'metric': 'linreg_gwas_variants_per_sec_per_chip_10k_samples_f64',
        'value': round(variants_per_sec, 1),
        'unit': 'variants/sec/chip',
        'vs_baseline': round(variants_per_sec / base_vps, 3),
    }))


if __name__ == '__main__':
    main()
