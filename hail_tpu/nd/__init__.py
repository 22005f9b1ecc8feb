"""`hl.nd` — ndarray constructors (reference hail/python/hail/nd/nd.py).

NDArray expressions are object columns holding numpy arrays; device-tier
linear algebra lives in hail_tpu.linalg / hail_tpu.ops.
"""

from __future__ import annotations

import numpy as np

from .. import types as ht
from ..expr import functions as F
from ..expr.expression import construct_expr, to_expr
from ..ir import columns as C
from ..ir.columns import ObjectColumn
from ..ir.nodes import Apply


def _nd_apply(name, result_typ, f, *exprs):
    return F._apply(name, result_typ, F._obj_impl(result_typ, f), *exprs)


def array(input_array):
    from ..ir.nodes import Literal
    if isinstance(input_array, np.ndarray) or (
            isinstance(input_array, (list, tuple)) and not any(
                hasattr(v, '_ir') for v in np.asarray(input_array, dtype=object).ravel())):
        arr = np.asarray(input_array)
        et = {np.dtype(np.int32): ht.tint32, np.dtype(np.int64): ht.tint64,
              np.dtype(np.float32): ht.tfloat32, np.dtype(np.float64): ht.tfloat64,
              np.dtype(np.bool_): ht.tbool}.get(arr.dtype, ht.tfloat64)
        if arr.dtype == object:
            arr = arr.astype(np.float64)
            et = ht.tfloat64
        t = ht.tndarray(et, arr.ndim)
        return construct_expr(Literal(arr, t))
    if isinstance(input_array, (list, tuple)) and any(
            hasattr(v, '_ir') for v in input_array):
        # element expressions: build a MakeArray then convert
        elems = [to_expr(v) for v in input_array]
        et2 = elems[0].dtype
        for el in elems[1:]:
            u = ht.unify_types(et2, el.dtype)
            et2 = u if u is not None else et2
        arr_e = F.array([F._coerce_scalar(el, et2) if hasattr(F, '_coerce_scalar')
                         else el for el in elems])
        t = ht.tndarray(et2 if et2 in (ht.tint32, ht.tint64, ht.tfloat32,
                                       ht.tfloat64, ht.tbool) else ht.tfloat64, 1)
        npdt = t.element_type.numpy_dtype or np.float64
        return _nd_apply('nd_array', t,
                         lambda v: np.asarray([np.nan if x is None else x for x in v],
                                              dtype=npdt), arr_e)
    e = to_expr(input_array)
    t = ht.tndarray(ht.tfloat64, 1)
    return _nd_apply('nd_array', t, lambda v: np.asarray(v, dtype=np.float64), e)


def arange(start, stop=None, step=1):
    if stop is None:
        start, stop = 0, start
    t = ht.tndarray(ht.tint32, 1)
    return _nd_apply('nd_arange', t, lambda a, b, c: np.arange(a, b, c, dtype=np.int32),
                     to_expr(start), to_expr(stop), to_expr(step))


def full(shape, value, dtype=None):
    t = ht.tndarray(ht.tfloat64, len(shape) if isinstance(shape, (list, tuple)) else 1)
    shp = tuple(shape) if isinstance(shape, (list, tuple)) else (shape,)
    return _nd_apply('nd_full', t, lambda v: np.full(shp, v), to_expr(value))


def zeros(shape, dtype=None):
    return full(shape, 0.0)


def ones(shape, dtype=None):
    return full(shape, 1.0)


def eye(N, M=None, dtype=None):
    t = ht.tndarray(ht.tfloat64, 2)
    return _nd_apply('nd_eye', t, lambda n_, m_: np.eye(int(n_), int(m_) if m_ is not None else None),
                     to_expr(N), to_expr(M if M is not None else N))


def identity(N):
    return eye(N)


def diagonal(nd):
    t = ht.tndarray(nd.dtype.element_type, 1)
    return _nd_apply('nd_diagonal', t, lambda a: np.diagonal(np.asarray(a)).copy(), nd)


def solve(a, b, no_crash: bool = False):
    t = ht.tndarray(ht.tfloat64, to_expr(b).dtype.ndim)
    return _nd_apply('nd_solve', t, lambda x, y: np.linalg.solve(np.asarray(x), np.asarray(y)),
                     to_expr(a), to_expr(b))


def solve_triangular(a, b, lower: bool = False, no_crash: bool = False):
    import scipy.linalg
    t = ht.tndarray(ht.tfloat64, to_expr(b).dtype.ndim)
    return _nd_apply('nd_solve_triangular', t,
                     lambda x, y: scipy.linalg.solve_triangular(np.asarray(x), np.asarray(y), lower=lower),
                     to_expr(a), to_expr(b))


def qr(nd, mode: str = 'reduced'):
    e = to_expr(nd)
    t = ht.ttuple(ht.tndarray(ht.tfloat64, 2), ht.tndarray(ht.tfloat64, 2))
    return _nd_apply('nd_qr', t, lambda a: tuple(np.linalg.qr(np.asarray(a), mode=mode)), e)


def svd(nd, full_matrices: bool = True, compute_uv: bool = True):
    e = to_expr(nd)
    if compute_uv:
        t = ht.ttuple(ht.tndarray(ht.tfloat64, 2), ht.tndarray(ht.tfloat64, 1),
                      ht.tndarray(ht.tfloat64, 2))
        return _nd_apply('nd_svd', t,
                         lambda a: tuple(np.linalg.svd(np.asarray(a), full_matrices=full_matrices)), e)
    t = ht.tndarray(ht.tfloat64, 1)
    return _nd_apply('nd_svd', t, lambda a: np.linalg.svd(np.asarray(a), compute_uv=False), e)


def eigh(nd, eigvals_only: bool = False):
    e = to_expr(nd)
    if eigvals_only:
        t = ht.tndarray(ht.tfloat64, 1)
        return _nd_apply('nd_eigh', t, lambda a: np.linalg.eigvalsh(np.asarray(a)), e)
    t = ht.ttuple(ht.tndarray(ht.tfloat64, 1), ht.tndarray(ht.tfloat64, 2))
    return _nd_apply('nd_eigh', t, lambda a: tuple(np.linalg.eigh(np.asarray(a))), e)


def inv(nd):
    t = ht.tndarray(ht.tfloat64, 2)
    return _nd_apply('nd_inv', t, lambda a: np.linalg.inv(np.asarray(a)), to_expr(nd))


def concatenate(nds, axis: int = 0):
    es = [to_expr(x) for x in nds]
    t = es[0].dtype
    from ..expr.functions import _apply, _obj_impl
    def f(*arrs):
        return np.concatenate([np.asarray(a) for a in arrs], axis=axis)
    return _apply('nd_concatenate', t, _obj_impl(t, f), *es)


def hstack(nds):
    """Stack along columns; 1-D inputs concatenate (numpy hstack semantics,
    reference nd.py hstack)."""
    es = [to_expr(x) for x in nds]
    ndim = es[0].dtype.ndim
    return concatenate(nds, axis=0 if ndim == 1 else 1)


def vstack(nds):
    """Stack as rows; 1-D inputs become rows (numpy vstack semantics,
    reference nd.py vstack)."""
    es = [to_expr(x) for x in nds]
    t = es[0].dtype
    out_t = ht.tndarray(t.element_type, 2)
    from ..expr.functions import _apply, _obj_impl

    def f(*arrs):
        return np.vstack([np.atleast_2d(np.asarray(a)) for a in arrs])
    return _apply('nd_vstack', out_t, _obj_impl(out_t, f), *es)


def maximum(a, b):
    """Elementwise max; nan-propagating (reference nd.py maximum)."""
    ea, eb = to_expr(a), to_expr(b)
    t = ea.dtype if hasattr(ea.dtype, 'ndim') else eb.dtype
    from ..expr.functions import _apply, _obj_impl

    def f(x, y):
        xv, yv = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        out = np.maximum(xv, yv)
        return np.where(np.isnan(xv) | np.isnan(yv), np.nan, out)
    return _apply('nd_maximum', t, _obj_impl(t, f), ea, eb)


def minimum(a, b):
    """Elementwise min; nan-propagating (reference nd.py minimum)."""
    ea, eb = to_expr(a), to_expr(b)
    t = ea.dtype if hasattr(ea.dtype, 'ndim') else eb.dtype
    from ..expr.functions import _apply, _obj_impl

    def f(x, y):
        xv, yv = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        out = np.minimum(xv, yv)
        return np.where(np.isnan(xv) | np.isnan(yv), np.nan, out)
    return _apply('nd_minimum', t, _obj_impl(t, f), ea, eb)


def from_column_major(a, shape):
    """Interpret flat array `a` as a column-major (Fortran-order) matrix of
    `shape` (reference nd/nd.py:66)."""
    assert len(shape) == 2
    return array(a).reshape(tuple(reversed(shape))).T


def solve_helper(nd_coef, nd_dep, nd_dep_ndim_orig):
    """Shape/dtype-normalizing wrapper used by the regression paths
    (reference nd/nd.py:322)."""
    assert nd_dep_ndim_orig in (1, 2)
    if nd_dep_ndim_orig == 1:
        nd_dep = nd_dep.reshape((-1, 1))
    sol = solve(nd_coef, nd_dep)
    if nd_dep_ndim_orig == 1:
        sol = sol.reshape((-1,))
    return sol
