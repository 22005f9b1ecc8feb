"""Runtime argument typechecking decorators (reference `hail/typecheck/check.py`):
`@typecheck` / `@typecheck_method` bind call arguments against the function
signature and run each through a named checker, coercing where the checker
transforms values (`transformed`, container rebuilds). A parameter without a
checker is a decorator misuse and raises RuntimeError at call time, mirroring
the reference behavior."""

from __future__ import annotations

import functools
import inspect
from typing import Any


class TypecheckFailure(Exception):
    """Internal signal: a value did not satisfy a checker."""


def identity(x):
    return x


class TypeChecker:
    def check(self, x, caller='', param=''):
        raise NotImplementedError

    def expects(self) -> str:
        raise NotImplementedError

    @staticmethod
    def format(x) -> str:
        return f'{x!r} (of type {type(x).__name__})'


def _to_checker(t) -> TypeChecker:
    if isinstance(t, TypeChecker):
        return t
    if isinstance(t, type):
        return InstanceChecker(t)
    raise RuntimeError(f'invalid typecheck annotation: {t!r}')


class AnyChecker(TypeChecker):
    def check(self, x, caller='', param=''):
        return x

    def expects(self):
        return 'any'


class AnyFuncChecker(TypeChecker):
    def check(self, x, caller='', param=''):
        if not callable(x):
            raise TypecheckFailure
        return x

    def expects(self):
        return 'function'


class InstanceChecker(TypeChecker):
    def __init__(self, t: type):
        self.t = t

    def check(self, x, caller='', param=''):
        if not isinstance(x, self.t):
            raise TypecheckFailure
        return x

    def expects(self):
        return self.t.__name__


class LazyChecker(TypeChecker):
    def __init__(self):
        self._t = None

    def set(self, t):
        self._t = t
        return self

    def check(self, x, caller='', param=''):
        if self._t is None:
            raise RuntimeError('lazy type checker was never set')
        if not isinstance(x, self._t):
            raise TypecheckFailure
        return x

    def expects(self):
        return self._t.__name__ if self._t is not None else 'lazy(unset)'


class ExactlyChecker(TypeChecker):
    def __init__(self, v, reference_equality=False):
        self.v = v
        self.reference_equality = reference_equality

    def check(self, x, caller='', param=''):
        if self.reference_equality:
            if x is self.v:
                return x
        elif x == self.v:
            return x
        raise TypecheckFailure

    def expects(self):
        return f'exactly {self.v!r}'


class OneOfChecker(TypeChecker):
    def __init__(self, *ts):
        self.checkers = [_to_checker(t) for t in ts]

    def check(self, x, caller='', param=''):
        for c in self.checkers:
            try:
                return c.check(x, caller, param)
            except TypecheckFailure:
                continue
        raise TypecheckFailure

    def expects(self):
        return ' or '.join(c.expects() for c in self.checkers)


class EnumerationChecker(TypeChecker):
    def __init__(self, *values):
        self.values = values

    def check(self, x, caller='', param=''):
        if x in self.values:
            return x
        raise TypecheckFailure

    def expects(self):
        return f'one of {self.values!r}'


class NullableChecker(TypeChecker):
    def __init__(self, t):
        self.inner = _to_checker(t)

    def check(self, x, caller='', param=''):
        if x is None:
            return None
        return self.inner.check(x, caller, param)

    def expects(self):
        return f'{self.inner.expects()} or None'


class SequenceChecker(TypeChecker):
    _container_types = (list, tuple)

    def __init__(self, t):
        self.element = _to_checker(t)

    def check(self, x, caller='', param=''):
        if not isinstance(x, self._container_types):
            raise TypecheckFailure
        return [self.element.check(v, caller, param) for v in x]

    def expects(self):
        return f'sequence of {self.element.expects()}'


class TupleOfChecker(TypeChecker):
    def __init__(self, t):
        self.element = _to_checker(t)

    def check(self, x, caller='', param=''):
        if not isinstance(x, tuple):
            raise TypecheckFailure
        return tuple(self.element.check(v, caller, param) for v in x)

    def expects(self):
        return f'tuple of {self.element.expects()}'


class SizedTupleChecker(TypeChecker):
    def __init__(self, *ts):
        self.elements = [_to_checker(t) for t in ts]

    def check(self, x, caller='', param=''):
        if not (isinstance(x, tuple) and len(x) == len(self.elements)):
            raise TypecheckFailure
        return tuple(c.check(v, caller, param)
                     for c, v in zip(self.elements, x))

    def expects(self):
        return f'tuple of ({", ".join(c.expects() for c in self.elements)})'


class SetChecker(TypeChecker):
    def __init__(self, t):
        self.element = _to_checker(t)

    def check(self, x, caller='', param=''):
        if not isinstance(x, (set, frozenset)):
            raise TypecheckFailure
        return {self.element.check(v, caller, param) for v in x}

    def expects(self):
        return f'set of {self.element.expects()}'


class DictChecker(TypeChecker):
    def __init__(self, k, v):
        self.key = _to_checker(k)
        self.value = _to_checker(v)

    def check(self, x, caller='', param=''):
        if not isinstance(x, dict):
            raise TypecheckFailure
        return {self.key.check(k, caller, param):
                self.value.check(v, caller, param) for k, v in x.items()}

    def expects(self):
        return f'dict of {self.key.expects()} -> {self.value.expects()}'


class SliceChecker(TypeChecker):
    def __init__(self, startt, stopt, stept):
        self.start = _to_checker(startt)
        self.stop = _to_checker(stopt)
        self.step = _to_checker(stept)

    def check(self, x, caller='', param=''):
        if not isinstance(x, slice):
            raise TypecheckFailure
        return slice(self.start.check(x.start, caller, param),
                     self.stop.check(x.stop, caller, param),
                     self.step.check(x.step, caller, param))

    def expects(self):
        return 'slice'


class LinkedListChecker(TypeChecker):
    def __init__(self, t):
        self.t = t

    def check(self, x, caller='', param=''):
        from ..utils.misc import LinkedList
        if not isinstance(x, LinkedList):
            raise TypecheckFailure
        return x

    def expects(self):
        return 'linked list'


class CharChecker(TypeChecker):
    def check(self, x, caller='', param=''):
        if isinstance(x, str) and len(x) == 1:
            return x
        raise TypecheckFailure

    def expects(self):
        return 'char (str of length 1)'


class FunctionChecker(TypeChecker):
    """Accepts a callable invokable with `nargs` positional arguments; the
    wrapped callable's return value is checked through `ret`."""

    def __init__(self, nargs: int, ret):
        self.nargs = nargs
        self.ret = _to_checker(ret)

    def check(self, x, caller='', param=''):
        if not callable(x):
            raise TypecheckFailure
        try:
            sig = inspect.signature(x)
        except (TypeError, ValueError):
            sig = None
        if sig is not None:
            required = 0
            positional = 0
            has_varargs = False
            for p in sig.parameters.values():
                if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
                    positional += 1
                    if p.default is p.empty:
                        required += 1
                elif p.kind == p.VAR_POSITIONAL:
                    has_varargs = True
                elif p.kind == p.KEYWORD_ONLY and p.default is p.empty:
                    raise TypecheckFailure
            if required > self.nargs:
                raise TypecheckFailure
            if self.nargs > positional and not has_varargs:
                raise TypecheckFailure

        checker = self

        @functools.wraps(x)
        def wrapped(*args, **kwargs):
            r = x(*args, **kwargs)
            try:
                return checker.ret.check(r, caller, param)
            except TypecheckFailure:
                raise TypeError(
                    f'{caller}: \'{param}\': expected return value of type '
                    f'{checker.ret.expects()}, got {TypeChecker.format(r)}'
                ) from None
        return wrapped

    def expects(self):
        return f'{self.nargs}-argument function returning {self.ret.expects()}'


class CoercionChecker(TypeChecker):
    """transformed((checker, fn), ...): first matching checker's fn maps the
    checked value."""

    def __init__(self, *pairs):
        self.pairs = [(_to_checker(t), fn) for t, fn in pairs]

    def check(self, x, caller='', param=''):
        for c, fn in self.pairs:
            try:
                v = c.check(x, caller, param)
            except TypecheckFailure:
                continue
            return fn(v)
        raise TypecheckFailure

    def expects(self):
        return ' or '.join(c.expects() for c, _ in self.pairs)


def only(t):
    return _to_checker(t)


def exactly(v, reference_equality=False):
    return ExactlyChecker(v, reference_equality)


def oneof(*args):
    return OneOfChecker(*args)


def enumeration(*args):
    return EnumerationChecker(*args)


def nullable(t):
    return NullableChecker(t)


def sequenceof(t):
    return SequenceChecker(t)


def tupleof(t):
    return TupleOfChecker(t)


def sized_tupleof(*args):
    return SizedTupleChecker(*args)


def sliceof(startt, stopt, stept):
    return SliceChecker(startt, stopt, stept)


def linked_list(t):
    return LinkedListChecker(t)


def setof(t):
    return SetChecker(t)


def dictof(k, v):
    return DictChecker(k, v)


def func_spec(n, tc):
    return FunctionChecker(n, tc)


def transformed(*tcs):
    return CoercionChecker(*tcs)


def lazy():
    return LazyChecker()


anytype = AnyChecker()
anyfunc = AnyFuncChecker()
numeric = oneof(int, float)
char = CharChecker()
table_type = anytype
matrix_table_type = anytype
expr_any = anytype


def _run_checks(f, checkers, skip_first, args, kwargs):
    name = getattr(f, '__qualname__', getattr(f, '__name__', '<fn>'))
    sig = inspect.signature(f)
    try:
        bound = sig.bind(*args, **kwargs)
    except TypeError:
        raise TypeError(f'{name}: invalid arguments for signature {sig}')
    params = list(sig.parameters.values())
    new_args: list = []
    new_kwargs: dict = {}
    for i, p in enumerate(params):
        if i == 0 and skip_first:
            if p.name in bound.arguments:
                new_args.append(bound.arguments[p.name])
            continue
        if p.name not in checkers:
            raise RuntimeError(
                f"{name}: parameter '{p.name}' has no defined checker; "
                f"annotate every parameter (use typecheck_method for methods)")
        c = _to_checker(checkers[p.name])
        if p.name not in bound.arguments:
            continue
        v = bound.arguments[p.name]

        def fail(val, extra=''):
            return TypeError(
                f'{name}: parameter \'{p.name}\'{extra}: expected '
                f'{c.expects()}, found {TypeChecker.format(val)}')

        if p.kind == p.VAR_POSITIONAL:
            out = []
            for j, x in enumerate(v):
                try:
                    out.append(c.check(x, name, p.name))
                except TypecheckFailure:
                    raise fail(x, f' (arg {j})') from None
            new_args.extend(out)
        elif p.kind == p.VAR_KEYWORD:
            for k, x in v.items():
                try:
                    new_kwargs[k] = c.check(x, name, p.name)
                except TypecheckFailure:
                    raise fail(x, f' (keyword {k})') from None
        else:
            try:
                checked = c.check(v, name, p.name)
            except TypecheckFailure:
                raise fail(v) from None
            if p.kind == p.KEYWORD_ONLY:
                new_kwargs[p.name] = checked
            else:
                new_args.append(checked)
    return new_args, new_kwargs


def typecheck(**checkers):
    """Decorator validating (and coercing) call arguments against named
    checkers (reference `typecheck/check.py` typecheck)."""
    def wrap(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            new_args, new_kwargs = _run_checks(f, checkers, False, args, kwargs)
            return f(*new_args, **new_kwargs)
        return wrapper
    return wrap


def typecheck_method(**checkers):
    """Like :func:`typecheck` but skips the first (self/cls) parameter."""
    def wrap(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            new_args, new_kwargs = _run_checks(f, checkers, True, args, kwargs)
            return f(*new_args, **new_kwargs)
        return wrapper
    return wrap
