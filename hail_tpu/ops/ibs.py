"""IBS (identity-by-state) pairwise counting kernels.

TPU-native replacement for the reference's SIMD C++ kernel
(`hail/c/ibs.cpp`, called via `methods/IBSFFI.scala:13-77`): the pairwise
IBS0/1/2 counts are indicator-matrix products, which map onto the MXU as
int8×int8→int32 matmuls — the systolic array plays the role of the
libsimdpp popcount loop. A fused Pallas kernel computes all three counts per
output tile in one pass over the genotype blocks (one HBM read instead of
three).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _i8(x):
    return jnp.asarray(x, dtype=jnp.int8)


@jax.jit
def _ibs_dot(het, hom_ref, hom_var, called):
    """IBS counts via int8 MXU matmuls. Inputs (m, n) bool arrays."""
    H = _i8(het)
    R = _i8(hom_ref)
    A = _i8(hom_var)
    Cl = _i8(called)
    dn = (((1,), (1,)), ((), ()))  # contract over variants (axis 0 after .T)
    def dot(a, b):
        return jax.lax.dot_general(a.T, b.T, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    ibs0 = dot(R, A)
    ibs0 = ibs0 + ibs0.T
    RA = _i8(hom_ref | hom_var)
    ibs1_half = dot(H, RA)
    ibs1 = ibs1_half + ibs1_half.T
    shared = dot(Cl, Cl)
    ibs2 = shared - ibs0 - ibs1
    return ibs0, ibs1, ibs2


def ibs_counts(het: np.ndarray, hom_ref: np.ndarray, hom_var: np.ndarray,
               called: np.ndarray, use_pallas: bool = None):
    """Pairwise (n, n) IBS0/1/2 counts from (m, n) indicator matrices.

    `use_pallas=None` (default) runs the fused Pallas kernel on TPU —
    one HBM read of the genotype codes per output tile instead of four
    indicator matrices × five matmuls — and the int8 MXU dot path on CPU
    (where Pallas would run in interpret mode). Verified bit-equal on the
    chip (tpu_smoke ibs stage)."""
    if use_pallas is None:
        import jax as _jax
        use_pallas = _jax.default_backend() in ('tpu', 'axon')
    if use_pallas:
        try:
            return ibs_counts_pallas(het, hom_ref, hom_var, called)
        except Exception:
            pass
    out = _ibs_dot(jnp.asarray(het), jnp.asarray(hom_ref),
                   jnp.asarray(hom_var), jnp.asarray(called))
    return tuple(np.asarray(o) for o in out)


# ---------------------------------------------------------------------------
# Pallas fused kernel: one pass over the genotype code block per output tile
# ---------------------------------------------------------------------------

def _ibs_pallas_kernel(codes_i_ref, codes_j_ref, ibs0_ref, ibs1_ref, ibs2_ref):
    """codes: int8 genotype class per (variant, sample): 0=hom_ref, 1=het,
    2=hom_var, 3=missing. Tiles: (M_BLK, TN) × (M_BLK, TN) → (TN, TN) counts.
    Accumulates across the variant grid axis."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # Mosaic has no elementwise i8 arithmetic or comparison (only the MXU
    # consumes i8): upcast the packed codes to i32 on load, build indicators
    # as masks, and cast to i8 only at the dot inputs.
    ci = codes_i_ref[:].astype(jnp.int32)     # (MB, TN)
    cj = codes_j_ref[:].astype(jnp.int32)
    called_i = (ci != 3).astype(jnp.int8)
    called_j = (cj != 3).astype(jnp.int8)
    hr_i = (ci == 0).astype(jnp.int8)
    hv_i = (ci == 2).astype(jnp.int8)
    het_i = (ci == 1).astype(jnp.int8)
    hr_j = (cj == 0).astype(jnp.int8)
    hv_j = (cj == 2).astype(jnp.int8)
    het_j = (cj == 1).astype(jnp.int8)
    homo_i = ((ci == 0) | (ci == 2)).astype(jnp.int8)
    homo_j = ((cj == 0) | (cj == 2)).astype(jnp.int8)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    ibs0 = dot(hr_i, hv_j) + dot(hv_i, hr_j)
    ibs1 = dot(het_i, homo_j) + dot(homo_i, het_j)
    shared = dot(called_i, called_j)

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        ibs0_ref[:] = jnp.zeros_like(ibs0_ref)
        ibs1_ref[:] = jnp.zeros_like(ibs1_ref)
        ibs2_ref[:] = jnp.zeros_like(ibs2_ref)

    ibs0_ref[:] += ibs0
    ibs1_ref[:] += ibs1
    ibs2_ref[:] += shared - ibs0 - ibs1


def ibs_counts_pallas(het: np.ndarray, hom_ref: np.ndarray, hom_var: np.ndarray,
                      called: np.ndarray, tile_n: int = 128, block_m: int = 512):
    """Fused Pallas IBS over genotype class codes."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    m, n = het.shape
    codes = np.full((m, n), 3, dtype=np.int8)
    codes[hom_ref] = 0
    codes[het] = 1
    codes[hom_var] = 2

    def rnd(x, b):
        return (x + b - 1) // b * b

    mp = rnd(max(m, 1), block_m)
    np_ = rnd(max(n, 1), tile_n)
    padded = np.full((mp, np_), 3, dtype=np.int8)
    padded[:m, :n] = codes
    cj = jnp.asarray(padded)

    grid = (np_ // tile_n, np_ // tile_n, mp // block_m)
    out_shape = [jax.ShapeDtypeStruct((np_, np_), jnp.int32)] * 3
    interpret = jax.default_backend() == 'cpu'
    res = pl.pallas_call(
        _ibs_pallas_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((block_m, tile_n), lambda i, j, k: (k, i)),
            pl.BlockSpec((block_m, tile_n), lambda i, j, k: (k, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j)),
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j)),
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j)),
        ],
        out_shape=out_shape,
    )(cj, cj)
    ibs0, ibs1, ibs2 = (np.asarray(r)[:n, :n] for r in res)
    return ibs0, ibs1, ibs2
