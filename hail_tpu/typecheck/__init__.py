"""Runtime argument typechecking decorators (reference hail/typecheck/):
the decorator surface downstream toolkits import. This implementation is a
permissive shim — checkers validate structure where cheap and otherwise pass
arguments through; strict type discipline lives in the typed IR constructors
(TypeError at expression-construction time).
"""

from __future__ import annotations

import functools
from typing import Any


class TypecheckFailure(Exception):
    pass


def identity(x):
    return x


class TypeChecker:
    def check(self, x, caller='', param=''):
        return x

    def expects(self):
        return 'any'


class AnyChecker(TypeChecker):
    pass


class LazyChecker(TypeChecker):
    def __init__(self):
        self._t = None

    def set(self, t):
        self._t = t
        return self


class _SimpleChecker(TypeChecker):
    def __init__(self, t):
        self.t = t

    def check(self, x, caller='', param=''):
        return x


def only(t):
    return _SimpleChecker(t)


def exactly(v, reference_equality=False):
    return _SimpleChecker(v)


def oneof(*args):
    return _SimpleChecker(args)


def enumeration(*args):
    return _SimpleChecker(args)


def nullable(t):
    return _SimpleChecker(t)


def sequenceof(t):
    return _SimpleChecker(t)


def tupleof(t):
    return _SimpleChecker(t)


def sized_tupleof(*args):
    return _SimpleChecker(args)


def sliceof(startt, stopt, stept):
    return _SimpleChecker((startt, stopt, stept))


def linked_list(t):
    return _SimpleChecker(t)


def setof(t):
    return _SimpleChecker(t)


def dictof(k, v):
    return _SimpleChecker((k, v))


def func_spec(n, tc):
    return _SimpleChecker((n, tc))


def transformed(*tcs):
    return _SimpleChecker(tcs)


def lazy():
    return LazyChecker()


anytype = AnyChecker()
anyfunc = AnyChecker()
numeric = oneof(int, float)
char = _SimpleChecker(str)
table_type = anytype
matrix_table_type = anytype
expr_any = anytype


def typecheck(**checkers):
    """Decorator validating call arguments (permissive shim)."""
    def wrap(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            return f(*args, **kwargs)
        return wrapper
    return wrap


def typecheck_method(**checkers):
    return typecheck(**checkers)
