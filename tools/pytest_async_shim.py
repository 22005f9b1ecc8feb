"""Minimal asyncio_mode=auto for environments without pytest-asyncio.

Runs `async def` tests and async (generator) fixtures on the per-thread
persistent loop (hail_tpu.utils.misc.hail_event_loop), which keeps
loop-bound aiohttp sessions valid across fixture setup / test / teardown.
Used by tools/batch_alias_tests.sh to execute the reference batch test
suites (whose pytest.ini sets asyncio_mode = auto).
"""

import functools
import inspect
import os
import signal

import pytest

# Per-test wall-clock cap (SIGALRM): a missing/buggy endpoint must fail the
# test, not hang the whole suite in a client poll loop.
_TEST_TIMEOUT_S = int(os.environ.get('ALIAS_TEST_TIMEOUT', '120'))


def _loop():
    from hail_tpu.utils.misc import hail_event_loop
    return hail_event_loop()


class _TestTimeout(Exception):
    pass


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    if _TEST_TIMEOUT_S <= 0 or not hasattr(signal, 'SIGALRM'):
        yield
        return

    def _on_alarm(signum, frame):
        raise _TestTimeout(
            f'test exceeded {_TEST_TIMEOUT_S}s (ALIAS_TEST_TIMEOUT)')

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


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
