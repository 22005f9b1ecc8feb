"""Typecheck markers, coercers, and analysis helpers from the reference's
`hail.expr` namespace (expressions/typed_expressions + check.py): downstream
toolkits (e.g. gnomad) import these directly.
"""

from __future__ import annotations

from .. import types as ht
from .expression import (Expression, construct_expr, to_expr, impute_type,
                         unify_all, Indices)


class ExpressionException(Exception):
    """Raised on invalid expression construction/use (reference
    expressions/base_expression.py)."""


# -- typecheck markers (reference expressions/typed_expressions.py):
# callables validating/coercing arguments in @typecheck signatures. Here they
# are predicate-style coercers: expr_x(arg) -> Expression of that type.
def _marker(check):
    def coerce(arg):
        e = to_expr(arg)
        if not check(e.dtype):
            raise ExpressionException(f'type mismatch: found {e.dtype}')
        return e
    return coerce


expr_any = lambda arg: to_expr(arg)
expr_int32 = _marker(lambda t: t == ht.tint32)
expr_int64 = _marker(lambda t: t in (ht.tint32, ht.tint64))
expr_float32 = _marker(lambda t: t == ht.tfloat32)
expr_float64 = _marker(lambda t: t in (ht.tint32, ht.tint64, ht.tfloat32, ht.tfloat64))
expr_numeric = _marker(lambda t: t in (ht.tint32, ht.tint64, ht.tfloat32, ht.tfloat64))
expr_bool = _marker(lambda t: t == ht.tbool)
expr_str = _marker(lambda t: t == ht.tstr)
expr_call = _marker(lambda t: t == ht.tcall)
expr_locus = _marker(lambda t: isinstance(t, ht.tlocus))
expr_array = _marker(lambda t: isinstance(t, ht.tarray))
expr_set = _marker(lambda t: isinstance(t, ht.tset))
expr_dict = _marker(lambda t: isinstance(t, ht.tdict))
expr_struct = _marker(lambda t: isinstance(t, ht.tstruct))
expr_tuple = _marker(lambda t: isinstance(t, ht.ttuple))
expr_interval = _marker(lambda t: isinstance(t, ht.tinterval))
expr_ndarray = _marker(lambda t: isinstance(t, ht.tndarray))


def expr_oneof(*checks):
    def coerce(arg):
        e = to_expr(arg)
        for c in checks:
            try:
                return c(e)
            except Exception:
                continue
        raise ExpressionException(f'no matching type for {e.dtype}')
    return coerce


def hail_type(t):
    """Coerce a type or type string to a HailType (reference
    typecheck hail_type)."""
    return ht.dtype(t) if isinstance(t, str) else t


def unify_types(*ts):
    return ht.unify_types(*ts)


def unify_types_limited(*ts):
    return ht.unify_types(*ts)


def types_match(ts1, ts2) -> bool:
    return [t.dtype if isinstance(t, Expression) else t for t in ts1] == \
           [t.dtype if isinstance(t, Expression) else t for t in ts2]


def unify_exprs(*exprs):
    es = [to_expr(e) for e in exprs]
    t = None
    for e in es:
        t = e.dtype if t is None else ht.unify_types(t, e.dtype)
    if t is None:
        return es + [False]
    return [e if e.dtype == t else e._promote(t) if hasattr(e, '_promote') else e
            for e in es] + [True]


def is_numeric(t) -> bool:
    return t in (ht.tint32, ht.tint64, ht.tfloat32, ht.tfloat64)


def is_primitive(t) -> bool:
    return t in (ht.tint32, ht.tint64, ht.tfloat32, ht.tfloat64, ht.tbool, ht.tstr)


def is_container(t) -> bool:
    return isinstance(t, (ht.tarray, ht.tset, ht.tdict))


def is_compound(t) -> bool:
    return isinstance(t, (ht.tstruct, ht.ttuple)) or is_container(t)


def coercer_from_dtype(t):
    """A coercer callable for `t` (reference expressions.coercer_from_dtype):
    coerce(x) returns an Expression of type t."""
    t = hail_type(t)

    class _Coercer:
        def coerce(self, x):
            e = to_expr(x)
            if e.dtype == t:
                return e
            from . import functions as F
            if t == ht.tfloat64:
                return F.float64(e)
            if t == ht.tfloat32:
                return F.float32(e)
            if t == ht.tint64:
                return F.int64(e)
            if t == ht.tint32:
                return F.int32(e)
            return e

        def can_coerce(self, typ):
            return ht.unify_types(typ, t) == t
    return _Coercer()


def matrix_table_source(caller: str, expr):
    """The MatrixTable an expression is bound to (reference check.py)."""
    from ..matrixtable import MatrixTable
    src = to_expr(expr)._indices.source
    if not isinstance(src, MatrixTable):
        raise ExpressionException(f'{caller}: expected a MatrixTable-bound '
                                  f'expression, found {type(src).__name__}')
    return src


def table_source(caller: str, expr):
    from ..table import Table
    src = to_expr(expr)._indices.source
    if not isinstance(src, Table):
        raise ExpressionException(f'{caller}: expected a Table-bound '
                                  f'expression, found {type(src).__name__}')
    return src


def raise_unless_row_indexed(caller: str, expr):
    e = to_expr(expr)
    if 'row' not in e._indices.axes:
        raise ExpressionException(f'{caller}: expression must be row-indexed')


def raise_unless_column_indexed(caller: str, expr):
    e = to_expr(expr)
    if 'col' not in e._indices.axes and 'column' not in e._indices.axes:
        raise ExpressionException(f'{caller}: expression must be column-indexed')


def raise_unless_entry_indexed(caller: str, expr):
    e = to_expr(expr)
    if not {'row', 'col'} <= set(a if a != 'column' else 'col' for a in e._indices.axes):
        raise ExpressionException(f'{caller}: expression must be entry-indexed')


def analyze(caller: str, expr, expected_indices, aggregation_axes=frozenset()):
    """Validate an expression against expected indices (reference
    expressions/check.py analyze). Index discipline is enforced at
    construction here, so this validates the source binding."""
    e = to_expr(expr)
    if hasattr(expected_indices, 'source') and expected_indices.source is not None:
        if e._indices.source is not None and e._indices.source is not expected_indices.source:
            raise ExpressionException(f'{caller}: expression bound to a different source')
    return e


def eval_typed(expr):
    """(value, type) of a source-free expression (reference eval_typed)."""
    e = to_expr(expr)
    from .functions import eval_expr
    return eval_expr(e), e.dtype


def eval_timed(expr):
    """(value, timings) (reference eval_timed)."""
    import time
    t0 = time.time()
    from .functions import eval_expr
    v = eval_expr(to_expr(expr))
    return v, {'total_ms': (time.time() - t0) * 1000.0}


#: hl.expr type aliases (reference exports tint/tfloat as int32/float64)
tint = ht.tint32
tfloat = ht.tfloat64


class Aggregation:
    """Marker for aggregation-context expressions (reference
    expressions/base_expression.py Aggregation)."""

    def __init__(self, *exprs):
        self.exprs = exprs
