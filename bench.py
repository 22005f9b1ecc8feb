"""North-star benchmark: linreg GWAS variants/sec/chip (BASELINE.json).

Measures the batched per-variant OLS kernel (the parity-true f64 path) on the
device over blocks of (BLOCK_R variants × N samples).

Methodology notes (axon relay semantics — see .claude/skills/verify/SKILL.md):
the relay materializes lazily (block_until_ready does not force execution)
and may deduplicate identical executions, so the timed loop (a) perturbs the
input block per iteration with a cheap scalar add, (b) chains a per-block
checksum through an eager accumulator, and (c) forces everything with ONE
scalar fetch at the end (device→host is ~0.7 MB/s, so per-block fetches
would dominate). Only two jit signatures compile: the kernel and the tiny
sum/add ops.

vs_baseline is the speedup over the identical computation in host numpy
(f64 BLAS) — the reference's execution substrate is CPU BLAS and it publishes
no absolute numbers (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(f'[bench] {msg}', file=sys.stderr, flush=True)


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
    from hail_tpu.ops.regression import linreg_block

    N = 10_000          # samples (BASELINE: 10k-sample GWAS)
    BLOCK_R = 8192      # variants per block (block sweep: ~6% over 4096)
    K = 4               # covariates incl. intercept
    N1, N2 = 8, 32      # two loop sizes; the rate uses the DIFFERENCE so the
                        # relay's fixed per-fetch latency cancels out

    rng = np.random.default_rng(0)
    cov = np.concatenate([np.ones((N, 1)), rng.normal(size=(N, K - 1))], axis=1)
    Q, _ = np.linalg.qr(cov)
    y = rng.normal(size=(N, 1))
    y_r = y - Q @ (Q.T @ y)
    yty_r = (y_r * y_r).sum(axis=0)
    dof = N - K - 1

    log('generating blocks on device (h2d over the tunnel is slow)...')
    t = time.time()
    n_blocks = 2
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_blocks + 1)
    Gs = [jax.random.randint(keys[i], (BLOCK_R, N), 0, 3).astype(jnp.float64)
          for i in range(n_blocks)]
    M0 = jax.random.uniform(keys[-1], (BLOCK_R, N)) < 0.02
    Qd = jnp.asarray(Q)
    yd = jnp.asarray(y_r)
    ytyd = jnp.asarray(yty_r)
    dd = jnp.asarray(float(dof))
    # force generation with ONE tiny fetch (each d2h roundtrip can cost
    # tens of seconds when the relay is degraded)
    probe = Gs[0][0, 0]
    for g in Gs[1:]:
        probe = probe + g[0, 0]
    _ = float(probe + M0[0, 0])
    G0 = Gs[0]
    log(f'generated in {time.time() - t:.1f}s')

    log('warmup compile...')
    t = time.time()
    out = linreg_block(G0, M0, Qd, yd, ytyd, dd)
    beta0 = np.asarray(out[3])
    assert np.isfinite(beta0).all()
    log(f'warm in {time.time() - t:.1f}s')

    # timed loops: cycle distinct pre-staged blocks, chain checksums, fetch
    # once per loop. The reported rate uses T(N2) - T(N1), which cancels the
    # relay's per-fetch roundtrip latency (can be tens of seconds when the
    # tunnel is degraded — .claude/skills/verify/SKILL.md).
    def timed_loop(n_iter, salt):
        # perturb y per iteration: the relay deduplicates IDENTICAL lazy
        # executions, so every call must differ (verify/SKILL.md). A (N,1)
        # add is ~0.1% of the kernel's work.
        t0 = time.time()
        acc = jnp.float64(0.0)
        for i in range(n_iter):
            yi = yd + jnp.float64((salt + i) * 1e-12)
            out = linreg_block(Gs[i % n_blocks], M0, Qd, yi, ytyd, dd)
            acc = acc + out[3].sum()
        total = float(acc)
        return time.time() - t0, total

    _tw, _ = timed_loop(2, -100)   # warm the perturb/accumulate ops too
    log(f'warm loop: {_tw:.2f}s')
    t1, tot1 = timed_loop(N1, 0)
    log(f'loop N1={N1}: {t1:.2f}s (checksum {tot1:.2f})')
    t2, tot2 = timed_loop(N2, 1000)
    log(f'loop N2={N2}: {t2:.2f}s (checksum {tot2:.2f})')
    if t2 > t1 * 1.05:
        variants_per_sec = BLOCK_R * (N2 - N1) / (t2 - t1)
    else:  # degenerate timing (relay hiccup) — fall back to the larger loop
        variants_per_sec = BLOCK_R * N2 / t2
    log(f'rate {variants_per_sec:.0f} variants/sec/chip')

    # host-numpy baseline (same computation + p-values, f64 BLAS)
    import scipy.stats as st
    G_host = rng.integers(0, 3, (BLOCK_R, N)).astype(np.float64)
    miss_host = rng.random((BLOCK_R, N)) < 0.02
    t0 = time.time()
    beta, se, cnt = numpy_linreg_block(G_host, miss_host, Q, y_r, yty_r, dof)
    with np.errstate(all='ignore'):
        _ = 2 * st.t.sf(np.abs(beta / se), dof)
    base_dt = time.time() - t0
    base_vps = BLOCK_R / base_dt
    log(f'numpy baseline: {base_vps:.0f} variants/sec')

    print(json.dumps({
        'metric': 'linreg_gwas_variants_per_sec_per_chip_10k_samples_f64',
        'value': round(variants_per_sec, 1),
        'unit': 'variants/sec/chip',
        'vs_baseline': round(variants_per_sec / base_vps, 3),
    }))


if __name__ == '__main__':
    main()
