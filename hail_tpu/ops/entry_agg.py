"""Device tier for generic entry aggregations (round-2 verdict item 9).

`MatrixTable.aggregate_entries` expressions built from primitive arithmetic
over entry/row/col fields (incl. `GT.n_alt_alleles()`), lowered here to a
single jitted jnp reduction per partition instead of the host numpy
evaluator. Mirrors the reference's staged seqOp codegen
(`expr/ir/agg/Extract.scala:26-146` + Emit) with XLA as the codegen layer:
the whole expression fuses into the reduction, so a 1e8-cell aggregate is
one compiled kernel per partition.

Missingness is explicit: every compiled node returns (values, mask) with
Kleene logic for booleans, exactly matching the host evaluator's 3-valued
semantics. Falls back (returns None) for anything not supported —
correctness never depends on this tier.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import types as ht
from ..ir import columns as C
from ..ir.nodes import (NA, AggOp, Apply, ApplyBinaryOp, ApplyUnaryOp, Cast,
                        Coalesce, GetField, If, IsMissing, Literal, Ref)


class _Unsupported(Exception):
    pass


_NUMERIC = (ht.tint32, ht.tint64, ht.tfloat32, ht.tfloat64, ht.tbool)

# genetics.call packed layout (genetics/call.py)
_PLOIDY_MASK = 3
_J_SHIFT = 3
_K_SHIFT = 17


def _compile(ir, leaves: Dict[str, Tuple[str, str]]):
    """IR → closure(env: dict name→(vals, mask)) → (vals, mask).

    `leaves` records required fields as key '<axis>.<field>' →
    (axis, field); masks are boolean arrays broadcastable with vals."""
    import jax.numpy as jnp

    def leaf(axis, field, kind='value'):
        key = f'{axis}.{field}.{kind}'
        leaves[key] = (axis, field, kind)
        return lambda env: env[key]

    def rec(node):
        if isinstance(node, GetField) and isinstance(node.struct, Ref) \
                and node.struct.name in ('g', 'va', 'sa'):
            axis = node.struct.name
            if node.typ == ht.tcall:
                raise _Unsupported('bare call field')
            if node.typ not in _NUMERIC:
                raise _Unsupported(f'field type {node.typ}')
            v = leaf(axis, node.name, 'value')
            m = leaf(axis, node.name, 'mask')
            return lambda env: (v(env), m(env))
        if isinstance(node, Apply) and node.name == 'n_alt_alleles' \
                and len(node.args) == 1:
            a = node.args[0]
            if isinstance(a, GetField) and isinstance(a.struct, Ref) \
                    and a.typ == ht.tcall:
                v = leaf(a.struct.name, a.name, 'value')
                m = leaf(a.struct.name, a.name, 'mask')

                def f(env):
                    packed = env[f'{a.struct.name}.{a.name}.value']
                    ploidy = packed & _PLOIDY_MASK
                    aj = (packed >> _J_SHIFT) & ((1 << 14) - 1)
                    ak = (packed >> _K_SHIFT) & ((1 << 15) - 1)
                    nalt = (((aj != 0) & (ploidy >= 1)).astype(jnp.int32)
                            + ((ak != 0) & (ploidy == 2)).astype(jnp.int32))
                    return nalt, m(env)
                return f
            raise _Unsupported('n_alt_alleles of non-field')
        if isinstance(node, NA):
            if node.typ not in _NUMERIC:
                raise _Unsupported('missing non-primitive')

            def f(env):
                return 0, True
            return f
        if isinstance(node, Literal):
            if node.typ not in _NUMERIC or node.value is None:
                raise _Unsupported('non-primitive literal')
            val = node.value

            def f(env):
                return val, False
            return f
        if isinstance(node, Cast):
            inner = rec(node.x)
            t = node.typ
            if t not in _NUMERIC:
                raise _Unsupported(f'cast to {t}')
            dt = {ht.tint32: jnp.int32, ht.tint64: jnp.int64,
                  ht.tfloat32: jnp.float32, ht.tfloat64: jnp.float64,
                  ht.tbool: jnp.bool_}[t]

            def f(env):
                v, m = inner(env)
                return jnp.asarray(v).astype(dt), m
            return f
        if isinstance(node, IsMissing):
            inner = rec(_only_child(node))

            def f(env):
                _, m = inner(env)
                return jnp.asarray(m), False
            return f
        if isinstance(node, Coalesce):
            subs = [rec(c) for c in _children(node)]

            def f(env):
                v, m = subs[0](env)
                v = jnp.asarray(v)
                for s in subs[1:]:
                    v2, m2 = s(env)
                    v = jnp.where(m, jnp.asarray(v2).astype(v.dtype), v)
                    m = jnp.logical_and(m, m2)
                return v, m
            return f
        if isinstance(node, If):
            c, t, f_ = (rec(x) for x in _children(node))

            def f(env):
                cv, cm = c(env)
                tv, tm = t(env)
                fv, fm = f_(env)
                tv = jnp.asarray(tv)
                fv = jnp.asarray(fv)
                out = jnp.where(cv, tv, fv.astype(tv.dtype) if tv.dtype != fv.dtype else fv)
                m = jnp.logical_or(cm, jnp.where(cv, tm, fm))
                return out, m
            return f
        if isinstance(node, ApplyUnaryOp):
            inner = rec(_only_child(node))
            op = node.op

            def f(env):
                v, m = inner(env)
                v = jnp.asarray(v)
                if op == '-':
                    return -v, m
                if op == '!':
                    return jnp.logical_not(v), m
                raise _Unsupported(op)
            if op not in ('-', '!'):
                raise _Unsupported(op)
            return f
        if isinstance(node, ApplyBinaryOp):
            lc, rc = _children(node)
            lf, rf = rec(lc), rec(rc)
            op = node.op
            if op in ('&', '|'):
                def f(env):
                    lv, lm = lf(env)
                    rv, rm = rf(env)
                    lv = jnp.asarray(lv, dtype=bool)
                    rv = jnp.asarray(rv, dtype=bool)
                    if op == '&':
                        out = jnp.logical_and(jnp.where(lm, True, lv),
                                              jnp.where(rm, True, rv))
                        m = jnp.logical_or(jnp.logical_and(lm, jnp.where(rm, True, rv)),
                                           jnp.logical_and(rm, jnp.where(lm, True, lv)))
                    else:
                        out = jnp.logical_or(jnp.where(lm, False, lv),
                                             jnp.where(rm, False, rv))
                        m = jnp.logical_or(
                            jnp.logical_and(lm, jnp.logical_not(jnp.where(rm, False, rv))),
                            jnp.logical_and(rm, jnp.logical_not(jnp.where(lm, False, lv))))
                    return out, m
                return f
            npf = {
                '+': jnp.add, '-': jnp.subtract, '*': jnp.multiply,
                '/': lambda a, b: jnp.true_divide(a, b),
                '//': jnp.floor_divide, '%': jnp.mod,
                '**': jnp.power,
                '==': lambda a, b: a == b, '!=': lambda a, b: a != b,
                '<': lambda a, b: a < b, '<=': lambda a, b: a <= b,
                '>': lambda a, b: a > b, '>=': lambda a, b: a >= b,
            }.get(op)
            if npf is None:
                raise _Unsupported(op)

            def f(env):
                lv, lm = lf(env)
                rv, rm = rf(env)
                out = npf(jnp.asarray(lv), jnp.asarray(rv))
                m = jnp.logical_or(lm, rm)
                return out, m
            return f
        raise _Unsupported(type(node).__name__)

    return rec(ir)


def _children(node):
    ch = node.children() if callable(node.children) else node.children
    return [c for c in ch if c is not None and not isinstance(c, (str, int, float))]


def _only_child(node):
    return _children(node)[0]


_SUPPORTED = {'count', 'count_where', 'sum', 'mean', 'stats', 'min', 'max',
              'fraction', 'any', 'all'}


def plan_device_entry_agg(agg_nodes: List[AggOp]):
    """Compile each AggOp's args/filter; returns (leaves, per-agg plans) or
    None when any aggregator/expression is unsupported."""
    leaves: Dict[str, Tuple[str, str, str]] = {}
    plans = []
    try:
        for node in agg_nodes:
            name = node.aggregator.name
            if name not in _SUPPORTED or node.init_args:
                return None
            if name == 'min' or name == 'max':
                if node.args[0].typ not in (ht.tint32, ht.tint64,
                                            ht.tfloat32, ht.tfloat64):
                    return None
            args = [_compile(a, leaves) for a in node.args]
            filt = _compile(node.filter_ir, leaves) \
                if node.filter_ir is not None else None
            plans.append((node, name, args, filt))
    except _Unsupported:
        return None
    return leaves, plans


def make_kernel(plans, order):
    """Build ONE jitted kernel shared by every partition of an aggregate
    call (jax re-traces per distinct partition shape only)."""
    import jax
    import jax.numpy as jnp

    def kernel(arrs, filt_mask):
        e = dict(zip(order, arrs))
        shape = jnp.broadcast_shapes(*[jnp.shape(a) for a in arrs]) \
            if arrs else jnp.shape(filt_mask)
        if filt_mask is not None:
            shape = jnp.broadcast_shapes(shape, jnp.shape(filt_mask))
        out = []
        for node, name, args, filt in plans:
            base_ok = jnp.ones(shape, dtype=bool)
            if filt_mask is not None:
                base_ok = base_ok & jnp.logical_not(filt_mask)
            if filt is not None:
                fv, fm = filt(e)
                base_ok = base_ok & jnp.logical_not(fm) & jnp.asarray(fv, dtype=bool)
            if name == 'count':
                out.append((jnp.sum(base_ok.astype(jnp.int64)),))
                continue
            v, m = args[0](e)
            v = jnp.broadcast_to(jnp.asarray(v), shape)
            m = jnp.broadcast_to(jnp.asarray(m), shape)
            ok = base_ok & jnp.logical_not(m)
            if name == 'count_where':
                out.append((jnp.sum((ok & v.astype(bool)).astype(jnp.int64)),))
            elif name == 'sum':
                dt = jnp.int64 if node.args[0].typ in (ht.tint32, ht.tint64, ht.tbool) \
                    else jnp.float64
                out.append((jnp.sum(jnp.where(ok, v, 0).astype(dt)),))
            elif name == 'mean':
                out.append((jnp.sum(jnp.where(ok, v, 0).astype(jnp.float64)),
                            jnp.sum(ok.astype(jnp.int64))))
            elif name == 'stats':
                vf = jnp.where(ok, v, 0).astype(jnp.float64)
                out.append((jnp.sum(vf), jnp.sum(vf * vf),
                            jnp.sum(ok.astype(jnp.int64)),
                            jnp.min(jnp.where(ok, v, jnp.inf)),
                            jnp.max(jnp.where(ok, v, -jnp.inf))))
            elif name in ('min', 'max'):
                vf = v.astype(jnp.float64)
                ok2 = ok & jnp.logical_not(jnp.isnan(vf))
                fill = jnp.inf if name == 'min' else -jnp.inf
                red = (jnp.min if name == 'min' else jnp.max)(
                    jnp.where(ok2, vf, fill))
                out.append((red, jnp.sum(ok2.astype(jnp.int64)) > 0))
            elif name == 'fraction':
                out.append((jnp.sum((ok & v.astype(bool)).astype(jnp.int64)),
                            jnp.sum(ok.astype(jnp.int64))))
            elif name == 'any':
                out.append((jnp.any(ok & v.astype(bool)),))
            else:   # all
                out.append((jnp.all(jnp.logical_not(ok) | v.astype(bool)),))
        return out

    return jax.jit(kernel)


_KERNEL_CACHE: Dict[tuple, object] = {}


def cached_kernel(agg_nodes, plans, order):
    """jitted kernels cache on the aggregation's semantic hash — repeated
    aggregate_entries calls (and fast restarts) reuse the compiled kernel
    (the reference's Compile cache keyed on (aggSigs, body),
    ir/Compile.scala:26-77)."""
    from ..ir.semhash import semhash
    try:
        key = tuple(
            (n.aggregator.name,
             tuple(semhash(a) for a in n.args),
             semhash(n.filter_ir) if n.filter_ir is not None else None)
            for n in agg_nodes) + (tuple(order),)
    except Exception:
        return make_kernel(plans, order)
    hit = _KERNEL_CACHE.get(key)
    if hit is None:
        hit = make_kernel(plans, order)
        if len(_KERNEL_CACHE) > 256:
            _KERNEL_CACHE.clear()
        _KERNEL_CACHE[key] = hit
    return hit


def run_device_entry_agg(mt, mb, part_idx, leaves, plans, jitted):
    """One partition → {agg uid: host-format partial state} on device."""
    R, Cn = mb.n_rows, mt._stage.n_cols
    env = {}
    for key, (axis, field, kind) in leaves.items():
        if axis == 'g':
            col = mb.entries.get(field)
            shape = (R, Cn)
        elif axis == 'va':
            col = mb.rows.columns.get(field)
            shape = (R, 1)
        else:
            col = mt._stage.cols.columns.get(field)
            shape = (1, Cn)
        if not isinstance(col, C.PrimitiveColumn):
            return None
        env[f'{axis}.{field}.value'] = np.asarray(col.values).reshape(shape)
        env[f'{axis}.{field}.mask'] = col.missing_mask().reshape(shape)
    include = mb.entry_missing   # filtered entries excluded from every agg
    order = sorted(env)
    if include is None:
        include = np.zeros((R, Cn), dtype=bool)
    res = jitted([env[k] for k in order], include)
    states = {}
    for (node, name, _a, _f), partial_ in zip(plans, res):
        vals = [np.asarray(x) for x in partial_]
        if name in ('count', 'count_where', 'sum'):
            states[node.uid] = vals[0]
        elif name in ('mean', 'fraction'):
            states[node.uid] = (vals[0], vals[1])
        elif name == 'stats':
            states[node.uid] = tuple(vals)
        elif name in ('min', 'max'):
            states[node.uid] = (vals[0], vals[1], node.args[0].typ)
        else:
            states[node.uid] = vals[0]
    return states
