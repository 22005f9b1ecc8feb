"""Minimal asyncio_mode=auto for environments without pytest-asyncio.

Runs `async def` tests and async (generator) fixtures on the per-thread
persistent loop (hail_tpu.utils.misc.hail_event_loop), which keeps
loop-bound aiohttp sessions valid across fixture setup / test / teardown.
Used by tools/batch_alias_tests.sh to execute the reference batch test
suites (whose pytest.ini sets asyncio_mode = auto).
"""

import functools
import inspect

import pytest


def _loop():
    from hail_tpu.utils.misc import hail_event_loop
    return hail_event_loop()


@pytest.hookimpl(tryfirst=True)
def pytest_pyfunc_call(pyfuncitem):
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        names = pyfuncitem._fixtureinfo.argnames
        kwargs = {n: pyfuncitem.funcargs[n] for n in names}
        _loop().run_until_complete(fn(**kwargs))
        return True
    return None


@pytest.hookimpl(tryfirst=True)
def pytest_fixture_setup(fixturedef, request):
    func = fixturedef.func
    if getattr(func, '_async_shim', False):
        return None
    if inspect.isasyncgenfunction(func):
        @functools.wraps(func)
        def _sync_gen(*a, **kw):
            agen = func(*a, **kw)
            v = _loop().run_until_complete(agen.__anext__())
            try:
                yield v
            finally:
                try:
                    _loop().run_until_complete(agen.__anext__())
                except StopAsyncIteration:
                    pass
        _sync_gen._async_shim = True
        fixturedef.func = _sync_gen
    elif inspect.iscoroutinefunction(func):
        @functools.wraps(func)
        def _sync(*a, **kw):
            return _loop().run_until_complete(func(*a, **kw))
        _sync._async_shim = True
        fixturedef.func = _sync
    return None
