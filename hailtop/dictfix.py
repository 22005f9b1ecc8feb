"""In-place dict normalization against a spec (reference hailtop/dictfix.py):
fill defaults for missing/None keys, recurse into nested dict specs, assert
types, and allow None via NoneOr."""

from __future__ import annotations


class NoneOr:
    """A spec value that may be None; otherwise the inner spec applies."""

    def __init__(self, subspec):
        self.subspec = subspec


def _fix(v, spec):
    if isinstance(spec, NoneOr):
        if v is None:
            return None
        return _fix(v, spec.subspec)
    if isinstance(spec, type):
        assert v is None or isinstance(v, spec), (v, spec)
        return v
    if isinstance(spec, dict):
        if v is None:
            v = {}
        assert isinstance(v, dict), v
        return dictfix(v, spec)
    if v is None:
        return spec
    return v


def dictfix(d, spec: dict):
    if d is None:
        d = {}
    assert isinstance(d, dict), d
    for k, s in spec.items():
        d[k] = _fix(d.get(k), s)
    return d
