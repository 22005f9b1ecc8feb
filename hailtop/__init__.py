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
import hail_tpu.batch.utils as _batch_utils
_sys.modules['hailtop.batch.utils'] = _batch_utils
import hail_tpu.batch.resource as _batch_resource
_sys.modules['hailtop.batch.resource'] = _batch_resource
import hail_tpu.batch.job as _batch_job
_sys.modules['hailtop.batch.job'] = _batch_job
import hail_tpu.batch.backend as _batch_backend
_sys.modules['hailtop.batch.backend'] = _batch_backend
import hail_tpu.batch.batch as _batch_batch
_sys.modules['hailtop.batch.batch'] = _batch_batch
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

# submodules the reference test-suites import (reference hailtop/*)
import hail_tpu.utils.structs as _structs
_fd = _types.ModuleType('hailtop.frozendict')
_fd.frozendict = _structs.frozendict
_sys.modules['hailtop.frozendict'] = _fd
_fl = _types.ModuleType('hailtop.hail_frozenlist')
_fl.frozenlist = _structs.frozenlist
_sys.modules['hailtop.hail_frozenlist'] = _fl

import hail_tpu.config as _cfg
_cfgmod = _types.ModuleType('hailtop.config')
_cfgmod.ConfigVariable = _cfg.ConfigVariable
_cfgmod.configuration_of = _cfg.configuration_of
_cfgmod.DeployConfig = _cfg.DeployConfig
_cfgmod.get_user_config = _cfg.get_user_config
_cfgmod.get_deploy_config = getattr(_cfg, 'get_deploy_config', None)


def _get_remote_tmpdir(caller_name, *, bucket=None, remote_tmpdir=None,
                       user_config=None, warnings_stacklevel=2):
    # reference hailtop/config/user_config.py:142 — configured remote tmpdir
    # or the local session tmpdir in this single-node build
    if remote_tmpdir is not None:
        return remote_tmpdir if remote_tmpdir.endswith('/') else remote_tmpdir + '/'
    cfg = _cfg.get_user_config()
    v = cfg.get('batch', 'remote_tmpdir', fallback=None) if cfg else None
    if v:
        return v if v.endswith('/') else v + '/'
    import tempfile as _tf
    return _tf.gettempdir() + '/hail_tpu_remote_tmp/'


_cfgmod.get_remote_tmpdir = _get_remote_tmpdir
import hail_tpu.services.deploy_config as _dcmod
_cfgmod.DeployConfig = _dcmod.DeployConfig
_cfgmod.get_deploy_config = _dcmod.get_deploy_config
_sys.modules['hailtop.config'] = _cfgmod
_sys.modules['hailtop.config.deploy_config'] = _dcmod
import hail_tpu.config as _ucmod
_sys.modules['hailtop.config.user_config'] = _ucmod

_proc = _types.ModuleType('hailtop.utils.process')
from hail_tpu.utils.misc import sync_check_exec as _sync_check_exec  # noqa: E402
_proc.sync_check_exec = _sync_check_exec
_sys.modules['hailtop.utils.process'] = _proc

_tu = _types.ModuleType('hailtop.test_utils')
import os as _os  # noqa: E402
import unittest as _unittest  # noqa: E402


def _in_azure() -> bool:
    return _os.environ.get('HAIL_CLOUD') == 'azure'


def skip_in_azure(fn):
    return _unittest.skipIf(_in_azure(), 'skipped in Azure')(fn)


def run_if_azure(fn):
    return _unittest.skipUnless(_in_azure(), 'Azure-only')(fn)


_tu.skip_in_azure = skip_in_azure
_tu.run_if_azure = run_if_azure
_sys.modules['hailtop.test_utils'] = _tu

import hail_tpu.fs.aio as _aio  # noqa: E402
_aiotools = _types.ModuleType('hailtop.aiotools')
_aiotools.AsyncFS = _aio.AsyncFS
_aiotools.LocalAsyncFS = _aio.LocalAsyncFS
_router_fs_mod = _types.ModuleType('hailtop.aiotools.router_fs')
_router_fs_mod.RouterAsyncFS = _aio.RouterAsyncFS
_aiotools.router_fs = _router_fs_mod
_sys.modules['hailtop.aiotools'] = _aiotools
_sys.modules['hailtop.aiotools.router_fs'] = _router_fs_mod

_aiocloud = _types.ModuleType('hailtop.aiocloud')
_aioazure = _types.ModuleType('hailtop.aiocloud.aioazure')


class AzureAsyncFS:  # noqa: N801 - reference name
    def __init__(self, *a, **kw):
        raise NotImplementedError(
            'AzureAsyncFS: cloud drivers are gated in this zero-egress build')

    @staticmethod
    def valid_url(url: str) -> bool:
        return url.startswith(('https://', 'hail-az://'))


_aioazure.AzureAsyncFS = AzureAsyncFS
_aiocloud.aioazure = _aioazure
_sys.modules['hailtop.aiocloud'] = _aiocloud
_sys.modules['hailtop.aiocloud.aioazure'] = _aioazure

# hailtop.batch_client / hailtop.httpx are REAL subpackages of this alias
# package (hailtop/batch_client/*.py) re-exporting
# hail_tpu/batch_service/{aioclient,sync_client}.py — no synthesis needed.

# extra hailtop.utils surface the reference batch tests import
from hail_tpu.utils.retries import (  # noqa: E402,F401
    delay_ms_for_try, external_requests_client_session,
    retry_response_returning_functions, retry_transient_errors,
    sleep_before_try, sync_sleep_before_try)
utils.delay_ms_for_try = delay_ms_for_try
utils.sleep_before_try = sleep_before_try
utils.sync_sleep_before_try = sync_sleep_before_try
utils.external_requests_client_session = external_requests_client_session
utils.retry_response_returning_functions = retry_response_returning_functions
utils.retry_transient_errors = retry_transient_errors
import hail_tpu.utils.rich_progress_bar as _rpb  # noqa: E402
utils.rich_progress_bar = _rpb
_sys.modules['hailtop.utils.rich_progress_bar'] = _rpb


class _HailCredentials:
    """reference hailtop.auth.hail_credentials: async context manager
    yielding a credentials object with auth_headers()."""

    def __init__(self, token=None):
        from hail_tpu.services.tokens import get_token
        if token is None:
            # standalone service: any non-empty bearer is the dev user
            token = get_token() or 'local-dev'
        self._token = token

    async def auth_headers(self):
        if self._token:
            return {'Authorization': f'Bearer {self._token}'}
        return {}

    async def auth_headers_with_expiration(self):
        return await self.auth_headers(), None

    async def access_token(self):
        return self._token

    async def close(self):
        pass

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        await self.close()


def hail_credentials(*, tokens_file=None, cloud_credentials_file=None,
                     namespace=None, authorize_target=True):
    return _HailCredentials()


auth.hail_credentials = hail_credentials

__pip_version__ = '0.2.135'
__version__ = __pip_version__
