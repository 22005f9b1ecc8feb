"""Speed-of-light GWAS linreg: int8 genotype storage, one-pass Pallas kernel.

The f64 parity kernel (ops/regression.py linreg_block) reads 8-byte dosages
and emulates f64 matmul — ~1% of HBM roofline on a v5e (round-1 verdict
item 5). This path stores genotypes as int8 (-1 = missing) so the hot loop
reads 1 byte/entry, casts to f32 *in VMEM*, and does both projection GEMMs
plus the row statistics in a single pass over G:

    per (R-tile, N-tile):  load G int8 → miss = G<0, Gz = max(G,0) f32
        GW  += Gz @ W      (W = [Q | y_r], f32)      [MXU]
        MW  += miss @ W                              [MXU]
        stats += [row-sum miss, row-sum Gz, row-sum Gz²]   [VPU]

Mean imputation is algebraic, applied in the epilogue: with Gz zero at
missing entries, Gi = Gz + mean·M, so Gi@W = GW + mean·MW and
Σ Gi² = Σ Gz² + mean²·n_miss — no second pass over G.

Reference blueprint: `hail/python/hail/methods/statgen.py:419-700`
(`_linear_regression_rows_nd` blocked GEMM) and
`is/hail/methods/LinearRegression.scala:18-198` (per-block Breeze GEMM).

f32 caveat: row sums are exact for counts/dosage sums below 2^24 (N up to
~4M samples with GT dosages ≤ 2) — fine for the supported regime.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_enable_x64', True)

TILE_R = 256
TILE_N = 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(g_ref, w_ref, o_ref):
    """One pass per (R-tile, N-tile): output block is [GW | MW | stats(3)]
    fused into a single (TILE_R, 2·KP+3) accumulator — Mosaic on v5e rejects
    this kernel split into 3 separate accumulated outputs (probed r2)."""
    from jax.experimental import pallas as pl
    j = pl.program_id(1)
    g = g_ref[:]                                   # (TILE_R, TILE_N) int8
    w = w_ref[:]                                   # (TILE_N, KP) f32
    # v5e has no int8 vector compare (Mosaic: "Target does not support this
    # comparison") — cast to f32 in-register first; -1/0/1/2 are exact.
    gf = g.astype(jnp.float32)
    mf = (gf < 0).astype(jnp.float32)
    gz = jnp.maximum(gf, 0.0)
    # HIGHEST: true-f32 (3-pass bf16) MXU — default reduces operands to bf16
    # and costs ~3 decimal digits on the betas
    gw = jnp.dot(gz, w, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    mw = jnp.dot(mf, w, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    o = jnp.concatenate([
        gw, mw,
        jnp.sum(mf, axis=1, keepdims=True),
        jnp.sum(gz, axis=1, keepdims=True),
        jnp.sum(gz * gz, axis=1, keepdims=True),
    ], axis=1)                                     # (TILE_R, 2*KP+3)

    @pl.when(j == 0)
    def _():
        o_ref[:] = o

    @pl.when(j > 0)
    def _():
        o_ref[:] = o_ref[:] + o


def _linreg_i8_sums(G8: jnp.ndarray, W: jnp.ndarray, interpret: bool):
    """Pallas pass over padded (R, N) int8 G. Returns (GW, MW, stats)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, N = G8.shape
    KP = W.shape[1]
    width = 2 * KP + 3
    grid = (R // TILE_R, N // TILE_N)
    # Mosaic on the v5e relay fails ("failed to legalize 'func.return'")
    # when this kernel is traced under jax_enable_x64 — the session enables
    # x64 for f64 parity elsewhere, so trace the pallas call with x64 off
    # (everything here is int8/f32; bisected r2).
    import contextlib
    x64_off = jax.enable_x64(False) if hasattr(jax, 'enable_x64') \
        else contextlib.nullcontext()
    with x64_off:
        out = _pallas_sums_call(G8, W, R, N, KP, width, grid, interpret)
    return out[:, :KP], out[:, KP:2 * KP], out[:, 2 * KP:]


def _pallas_sums_call(G8, W, R, N, KP, width, grid, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, TILE_N), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, KP), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, width), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, width), jnp.float32),
        interpret=interpret,
    )(G8, W)


def _sums_ref(G8, W):
    """jnp reference of the pallas pass (used on CPU and in parity tests)."""
    miss = G8 < 0
    gz = jnp.where(miss, 0, G8).astype(jnp.float32)
    mf = miss.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    gw = jnp.dot(gz, W, precision=hp)
    mw = jnp.dot(mf, W, precision=hp)
    st = jnp.stack([mf.sum(axis=1), gz.sum(axis=1), (gz * gz).sum(axis=1)],
                   axis=1)
    return gw, mw, st


@partial(jax.jit, static_argnames=('k', 'use_pallas', 'interpret'))
def linreg_block_i8(G8: jnp.ndarray, W: jnp.ndarray, Qty: jnp.ndarray,
                    yyp: jnp.ndarray, d: jnp.ndarray, k: int,
                    use_pallas: bool = True, interpret: bool = False):
    """int8-storage f32-compute per-variant OLS.

    G8: (R, N) int8, -1 = missing. W: (N, k+P) f32 = [Q | Ys] with Q the
    orthonormal covariate basis and Ys the phenotype matrix; Qty = Qᵀ Ys;
    yyp the residual y·y. Returns (sum_x, ytx, beta, se, t) per the
    reference nd formula (f32 precision; betas agree with the f64 path to
    ~1e-6 relative).
    """
    R, N = G8.shape
    Rp, Np = _ceil_to(R, TILE_R), _ceil_to(N, TILE_N)
    Gp = jnp.pad(G8, ((0, Rp - R), (0, Np - N)), constant_values=-1)
    Wp = jnp.pad(W.astype(jnp.float32), ((0, Np - N), (0, 0)))
    if use_pallas:
        GW, MW, ST = _linreg_i8_sums(Gp, Wp, interpret)
    else:
        GW, MW, ST = _sums_ref(Gp, Wp)
    GW, MW, ST = GW[:R], MW[:R], ST[:R]
    return _ols_epilogue(GW, MW, ST, Np - N, N, k, Qty, yyp, d)


def _ols_epilogue(GW, MW, ST, n_pad_cols, N, k, Qty, yyp, d):
    """Shared OLS finish: algebraic mean imputation + the reference nd block
    formula (statgen.py:631) from the one-pass sums. `n_pad_cols` padded
    sample columns count as all-missing. W = [Q | Ys]; degenerate fits
    propagate NaN (reference semantics, no masking)."""
    nmiss = ST[:, 0] - n_pad_cols
    cnt = jnp.float32(N) - nmiss
    s = ST[:, 1]
    ss = ST[:, 2]
    mean = s / cnt                                 # 0/0 → nan, as reference
    GiW = GW + mean[:, None] * MW                  # imputed G @ [Q | Ys]
    GQ = GiW[:, :k]
    ytx = GiW[:, k:]
    sum_x = s + mean * nmiss                       # sum of imputed x
    xyp = ytx - GQ @ Qty.astype(jnp.float32)
    xxp = ss + mean * mean * nmiss - jnp.sum(GQ * GQ, axis=1)
    rec = 1.0 / xxp
    beta = xyp * rec[:, None]
    se = jnp.sqrt((1.0 / d.astype(jnp.float32))
                  * (yyp.astype(jnp.float32)[None, :] * rec[:, None] - beta * beta))
    t = beta / se
    return sum_x, ytx, beta, se, t


@partial(jax.jit, static_argnames=('k',))
def linreg_block_call(packed: jnp.ndarray, missing: jnp.ndarray,
                      W: jnp.ndarray, Qty: jnp.ndarray, yyp: jnp.ndarray,
                      d: jnp.ndarray, k: int):
    """OLS directly from PACKED genotype calls: the n_alt_alleles decode
    (3 bit ops) runs ON DEVICE, fused by XLA into the GEMM pipeline — the
    host evaluator does zero per-entry work (the TPU-native answer to the
    host-eval bottleneck; BASELINE north star "dense int8 GT tensors").

    packed: (R, N) int32 in genetics.call layout (ploidy bits [0:2),
    j at [3:17), k at [17:32)); missing: (R, N) bool."""
    ploidy = packed & 3
    aj = (packed >> 3) & ((1 << 14) - 1)
    ak = (packed >> 17) & ((1 << 15) - 1)
    nalt = (((aj != 0) & (ploidy >= 1)).astype(jnp.float32)
            + ((ak != 0) & (ploidy == 2)).astype(jnp.float32))
    mf = missing.astype(jnp.float32)
    gz = nalt * (1.0 - mf)
    Wf = W.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    GW = jnp.dot(gz, Wf, precision=hp)
    MW = jnp.dot(mf, Wf, precision=hp)
    ST = jnp.stack([mf.sum(axis=1), gz.sum(axis=1), (gz * gz).sum(axis=1)],
                   axis=1)
    return _ols_epilogue(GW, MW, ST, 0, packed.shape[1], k, Qty, yyp, d)


# ---------------------------------------------------------------------------
# exact f64-parity path at int8-matmul speed (round-3 verdict item 1b)
#
# Genotypes are small integers, so every sum the OLS needs from G — Gᵀ[Q|Ys],
# Mᵀ[Q|Ys], ΣG, ΣG², missing counts — is computable EXACTLY from int8 MXU
# matmuls: decompose the float64 operand W into `planes` signed 7-bit digit
# planes with per-column power-of-two scales (W = Σ_d digit_d · s_d, s_d =
# 2^{e_col-7(d+1)}), stack the planes along W's column axis so G is read ONCE,
# run one int8×int8→int32 GEMM (exact: |g|≤2, |digit|≤127, N·254 < 2³¹ for
# N ≤ 8.4M samples), and recombine the int32 partials in f64. With 7 planes
# the reconstruction carries 49 bits — at or below f64 GEMM rounding — so the
# result matches the host f64 path to ~1e-13 relative while the hot loop
# stays 1 byte/entry. The k×k-free epilogue (reference nd formula,
# statgen.py:631) runs in f64 on device.
# ---------------------------------------------------------------------------

_EXACT_PLANES = 7
_DIGIT_BITS = 7


def _digit_planes(W: np.ndarray, planes: int = _EXACT_PLANES,
                  bits: int = _DIGIT_BITS):
    """Decompose f64 W (N, KP) into int8 digit planes stacked plane-major
    along axis 1 → (N, planes·KP), plus (planes, KP) f64 scales."""
    W = np.asarray(W, np.float64)
    amax = np.max(np.abs(W), axis=0)
    amax = np.where(amax == 0, 1.0, amax)
    base = np.exp2(np.ceil(np.log2(amax)))         # per-column block exponent
    resid = W / base
    mult = float(1 << bits)
    digs, scales = [], []
    for d_ in range(planes):
        q = np.clip(np.rint(resid * mult), -127, 127)
        digs.append(q.astype(np.int8))
        resid = resid * mult - q
        scales.append(base / (mult ** (d_ + 1)))
    return np.concatenate(digs, axis=1), np.stack(scales, axis=0)


def _exact_core(gz8, m8, Wdig, scales, Qty, yyp, d, k, planes):
    """Shared exact core: gz8 (R,N) int8 zero-at-missing genotypes, m8 (R,N)
    int8 missing indicators."""
    R, N = gz8.shape
    KP = Wdig.shape[1] // planes
    dn = (((1,), (0,)), ((), ()))
    GWd = jax.lax.dot_general(gz8, Wdig, dn,
                              preferred_element_type=jnp.int32)
    MWd = jax.lax.dot_general(m8, Wdig, dn,
                              preferred_element_type=jnp.int32)
    # recombine digit partials in f64: (R, planes, KP) · (planes, KP) → (R, KP)
    GW = jnp.sum(GWd.reshape(R, planes, KP).astype(jnp.float64)
                 * scales[None], axis=1)
    MW = jnp.sum(MWd.reshape(R, planes, KP).astype(jnp.float64)
                 * scales[None], axis=1)
    gz32 = gz8.astype(jnp.int32)
    nmiss = jnp.sum(m8.astype(jnp.int32), axis=1).astype(jnp.float64)
    s = jnp.sum(gz32, axis=1).astype(jnp.float64)
    ss = jnp.sum(gz32 * gz32, axis=1).astype(jnp.float64)
    # f64 epilogue — the reference nd formula with algebraic mean imputation
    cnt = jnp.float64(N) - nmiss
    mean = s / cnt                                 # 0/0 → nan, as reference
    GiW = GW + mean[:, None] * MW
    GQ = GiW[:, :k]
    ytx = GiW[:, k:]
    sum_x = s + mean * nmiss
    xyp = ytx - GQ @ Qty
    xxp = ss + mean * mean * nmiss - jnp.sum(GQ * GQ, axis=1)
    rec = 1.0 / xxp
    beta = xyp * rec[:, None]
    se = jnp.sqrt((1.0 / d) * (yyp[None, :] * rec[:, None] - beta * beta))
    t = beta / se
    return sum_x, ytx, beta, se, t


@partial(jax.jit, static_argnames=('k', 'planes'))
def linreg_block_i8_exact(G8, Wdig, scales, Qty, yyp, d, k,
                          planes=_EXACT_PLANES):
    miss = G8 < jnp.int8(0)
    gz8 = jnp.where(miss, jnp.int8(0), G8)
    m8 = miss.astype(jnp.int8)
    return _exact_core(gz8, m8, Wdig, scales, Qty, yyp, d, k, planes)


def pack_gt_2bit(packed: 'np.ndarray', missing) -> 'np.ndarray':
    """Host: packed-call int32 (R, N) [+ missing bool] → 2-bit codes packed
    4-per-byte, uint8 (R, ceil(N/4)). Code ∈ {0,1,2} = n_alt_alleles, 3 =
    missing. This is the wire form for the h2d staging of a linreg/GRM call:
    0.25 B/entry instead of the packed int32+bool's 5 — the cold path through
    the axon relay (~20 MB/s) is pure transfer, so 20× fewer bytes is 20×
    faster cold (round-4 verdict next-1). Mirrors the bit layout of
    `decode_packed_gt` (reference Call encoding, variant/Call.scala:14-77)."""
    ploidy = packed & 3
    aj = (packed >> 3) & ((1 << 14) - 1)
    ak = (packed >> 17) & ((1 << 15) - 1)
    nalt = (((aj != 0) & (ploidy >= 1)).astype(np.uint8)
            + ((ak != 0) & (ploidy == 2)).astype(np.uint8))
    if missing is not None:
        nalt = np.where(missing, np.uint8(3), nalt)
    R, N = nalt.shape
    N4 = -(-N // 4)
    if N4 * 4 != N:
        nalt = np.concatenate(
            [nalt, np.zeros((R, N4 * 4 - N), np.uint8)], axis=1)
    v = nalt.reshape(R, N4, 4)
    return (v[:, :, 0] | (v[:, :, 1] << 2) | (v[:, :, 2] << 4)
            | (v[:, :, 3] << 6)).astype(np.uint8)


@partial(jax.jit, static_argnames=('n',))
def unpack_gt_2bit(u8, n):
    """Device: 2-bit-packed codes → the cached (gz8, m8) int8 pair."""
    codes = jnp.stack([(u8 >> (2 * k)) & 3 for k in range(4)], axis=-1)
    codes = codes.reshape(u8.shape[0], -1)[:, :n].astype(jnp.int8)
    m8 = (codes == 3).astype(jnp.int8)
    return codes * (jnp.int8(1) - m8), m8


@jax.jit
def decode_packed_gt(packed, missing):
    """Packed calls → (gz8, m8) int8 pair on device (3 bit-ops): the cached
    form of an entry block — 2 bytes/entry in HBM instead of the packed
    int32+bool's 5, so every downstream kernel reads 2.5× less."""
    ploidy = packed & 3
    aj = (packed >> 3) & ((1 << 14) - 1)
    ak = (packed >> 17) & ((1 << 15) - 1)
    nalt = (((aj != 0) & (ploidy >= 1)).astype(jnp.int8)
            + ((ak != 0) & (ploidy == 2)).astype(jnp.int8))
    m8 = missing.astype(jnp.int8)
    return nalt * (jnp.int8(1) - m8), m8


@partial(jax.jit, static_argnames=('k', 'planes'))
def linreg_block_gz_exact(gz8, m8, Wdig, scales, Qty, yyp, d, k,
                          planes=_EXACT_PLANES):
    """Exact path from an already-decoded (gz8, m8) int8 pair."""
    return _exact_core(gz8, m8, Wdig, scales, Qty, yyp, d, k, planes)


@partial(jax.jit, static_argnames=('k', 'planes'))
def linreg_block_gz_exact_packed(gz8, m8, Wdig, scales, Qty, yyp, d, k,
                                 planes=_EXACT_PLANES):
    """Like linreg_block_gz_exact but returns ONE stacked (R, 1+4P) array so
    the host fetches a single buffer — on the relay each d2h round trip costs
    tens of ms, so 5 fetches per partition dominated the warm method call."""
    sum_x, ytx, beta, se, t = _exact_core(gz8, m8, Wdig, scales, Qty, yyp,
                                          d, k, planes)
    return jnp.concatenate([sum_x[:, None], ytx, beta, se, t], axis=1)


def _finish_stats_packed(packed_out, P, dof):
    """Split the stacked device result and finish p-values on host."""
    import scipy.stats as st
    arr = np.asarray(packed_out, dtype=np.float64)
    sum_x = arr[:, 0]
    ytx = arr[:, 1:1 + P]
    beta = arr[:, 1 + P:1 + 2 * P]
    se = arr[:, 1 + 2 * P:1 + 3 * P]
    t = arr[:, 1 + 3 * P:1 + 4 * P]
    with np.errstate(all='ignore'):
        p = 2 * st.t.sf(np.abs(t), dof) if dof > 0 else np.full_like(t, np.nan)
    return dict(sum_x=sum_x, y_transpose_x=ytx, beta=beta,
                standard_error=se, t_stat=t, p_value=p)


@partial(jax.jit, static_argnames=('k', 'planes'))
def linreg_block_call_exact(packed, missing, Wdig, scales, Qty, yyp, d, k,
                            planes=_EXACT_PLANES):
    """Exact path straight from PACKED calls: the 3-bit-op n_alt decode runs
    on device and feeds the int8 GEMM — zero host per-entry work."""
    gz8, m8 = decode_packed_gt(packed, missing)
    return _exact_core(gz8, m8, Wdig, scales, Qty, yyp, d, k, planes)


_MAX_EXACT_N = 8_000_000   # int32 GEMM accumulator: N·2·127 < 2³¹


@partial(jax.jit, static_argnames=('k', 'planes'))
def _linreg_block_i8_exact_packed(G8, Wdig, scales, Qty, yyp, d, k,
                                  planes=_EXACT_PLANES):
    miss = G8 < jnp.int8(0)
    gz8 = jnp.where(miss, jnp.int8(0), G8)
    sum_x, ytx, beta, se, t = _exact_core(gz8, miss.astype(jnp.int8), Wdig,
                                          scales, Qty, yyp, d, k, planes)
    return jnp.concatenate([sum_x[:, None], ytx, beta, se, t], axis=1)


def linreg_stats_i8_exact(G8: np.ndarray, Q: np.ndarray, Ys: np.ndarray,
                          Qty: np.ndarray, yyp: np.ndarray, dof: int):
    """Host wrapper: f64-parity results from int8 storage (default path).
    Single stacked d2h fetch (relay round trips dominate otherwise)."""
    k = Q.shape[1]
    W = np.concatenate([Q, Ys], axis=1)
    Wdig, scales = _digit_planes(W)
    out = _linreg_block_i8_exact_packed(
        jnp.asarray(G8), jnp.asarray(Wdig), jnp.asarray(scales),
        jnp.asarray(Qty, dtype=jnp.float64),
        jnp.asarray(yyp, dtype=jnp.float64), jnp.asarray(float(dof)), k)
    return _finish_stats_packed(out, Ys.shape[1], dof)


def linreg_stats_call_exact(packed: np.ndarray, missing, Q: np.ndarray,
                            Ys: np.ndarray, Qty: np.ndarray, yyp: np.ndarray,
                            dof: int, packed_dev=None, missing_dev=None):
    """Host wrapper of the packed-call exact path. `packed_dev`/`missing_dev`
    allow callers to pass already-device-resident buffers (device cache)."""
    k = Q.shape[1]
    W = np.concatenate([Q, Ys], axis=1)
    Wdig, scales = _digit_planes(W)
    if packed_dev is None:
        packed_dev = jnp.asarray(np.ascontiguousarray(packed, dtype=np.int32))
    if missing_dev is None:
        missing_dev = jnp.asarray(
            missing if missing is not None
            else np.zeros(packed.shape, dtype=bool))
    out = linreg_block_call_exact(
        packed_dev, missing_dev, jnp.asarray(Wdig), jnp.asarray(scales),
        jnp.asarray(Qty, dtype=jnp.float64),
        jnp.asarray(yyp, dtype=jnp.float64), jnp.asarray(float(dof)), k)
    return _finish_stats(out, dof)


def _finish_stats(out, dof):
    import scipy.stats as st
    sum_x, ytx, beta, se, t = (np.asarray(v, dtype=np.float64) for v in out)
    with np.errstate(all='ignore'):
        p = 2 * st.t.sf(np.abs(t), dof) if dof > 0 else np.full_like(t, np.nan)
    return dict(sum_x=sum_x, y_transpose_x=ytx, beta=beta,
                standard_error=se, t_stat=t, p_value=p)


def linreg_stats_call(packed: np.ndarray, missing, Q: np.ndarray,
                      Ys: np.ndarray, Qty: np.ndarray, yyp: np.ndarray,
                      dof: int):
    """Host wrapper of the packed-call device-decode path."""
    k = Q.shape[1]
    W = np.concatenate([Q, Ys], axis=1).astype(np.float32)
    if not isinstance(packed, jnp.ndarray):
        packed = jnp.asarray(np.ascontiguousarray(packed, dtype=np.int32))
    if missing is None:
        missing = np.zeros(packed.shape, dtype=bool)
    out = linreg_block_call(
        packed, jnp.asarray(missing), jnp.asarray(W), jnp.asarray(Qty),
        jnp.asarray(yyp), jnp.asarray(float(dof)), k)
    return _finish_stats(out, dof)


def linreg_stats_i8(G8: np.ndarray, Q: np.ndarray, Ys: np.ndarray,
                    Qty: np.ndarray, yyp: np.ndarray, dof: int):
    """Host wrapper: int8 fast path with p-values. XLA's fused jnp path
    measured slightly faster than the Pallas kernel on the v5e (5.9M vs
    4.5M variants/s, r2 race) — it is the default; set
    HAIL_TPU_LINREG_PALLAS=1 to use the Pallas kernel."""
    import os
    use_pallas = (jax.devices()[0].platform == 'tpu'
                  and os.environ.get('HAIL_TPU_LINREG_PALLAS') == '1')
    k = Q.shape[1]
    W = np.concatenate([Q, Ys], axis=1).astype(np.float32)
    out = linreg_block_i8(jnp.asarray(G8), jnp.asarray(W), jnp.asarray(Qty),
                          jnp.asarray(yyp), jnp.asarray(float(dof)), k,
                          use_pallas=use_pallas)
    return _finish_stats(out, dof)
