"""Drop-in alias: `hailtop.*` resolves to the hail_tpu service layers
(`hailtop.batch` -> hail_tpu.batch, `hailtop.fs` -> hail_tpu.fs, ...)."""

import sys as _sys

import hail_tpu as _ht
from hail_tpu.utils.hadoop import TemporaryDirectory, TemporaryFilename  # noqa: F401
from hail_tpu.context import ANY_REGION  # noqa: F401

batch = _ht.batch if hasattr(_ht, 'batch') else __import__('hail_tpu.batch', fromlist=['x'])
import hail_tpu.batch as batch  # noqa: F811,E402
import hail_tpu.fs as fs  # noqa: E402
import hail_tpu.utils as utils  # noqa: E402

_sys.modules['hailtop.batch'] = batch
_sys.modules['hailtop.fs'] = fs
_sys.modules['hailtop.utils'] = utils

import types as _types
import asyncio as _asyncio
import functools as _functools


def version() -> str:
    return _ht.__pip_version__


def hail_event_loop():
    """Reference hailtop.hail_event_loop: the running loop, or a fresh one
    bound to this thread."""
    try:
        return _asyncio.get_event_loop()
    except RuntimeError:
        loop = _asyncio.new_event_loop()
        _asyncio.set_event_loop(loop)
        return loop


def _decorator(dec):
    # reference hailtop.hail_decorator.decorator (vendored `decorator` lib
    # shape): dec(fn, *args, **kwargs)
    def wrapper(fn):
        @_functools.wraps(fn)
        def inner(*a, **kw):
            return dec(fn, *a, **kw)
        return inner
    return wrapper


_hel = _types.ModuleType('hailtop.hail_event_loop')
_hel.hail_event_loop = hail_event_loop
_sys.modules['hailtop.hail_event_loop'] = _hel
_hdec = _types.ModuleType('hailtop.hail_decorator')
_hdec.decorator = _decorator
_sys.modules['hailtop.hail_decorator'] = _hdec
_hver = _types.ModuleType('hailtop.version')
_hver.__version__ = _ht.__pip_version__
_sys.modules['hailtop.version'] = _hver
import hail_tpu.services.auth_client as auth  # noqa: E402
_sys.modules['hailtop.auth'] = auth
