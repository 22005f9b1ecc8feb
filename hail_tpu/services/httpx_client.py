"""Thin aiohttp wrapper with body-carrying errors (the `hailtop.httpx`
surface, reference hail/python/hailtop/httpx.py): every response with status
>= 400 raises ClientResponseError carrying the response body, and json()
uses the raw bytes. The batch_client rides on this; the reference's
fault-injection test session subclasses ClientSession and overrides
`request`."""

from __future__ import annotations

from types import TracebackType
from typing import Optional, Tuple, Type

import aiohttp


class ClientResponseError(aiohttp.ClientResponseError):
    def __init__(self, request_info, history, body: str = '', **kwargs):
        super().__init__(request_info, history, **kwargs)
        self.body = body

    def __str__(self) -> str:
        return (f'{self.status}, message={self.message!r}, '
                f'url={self.request_info.real_url!r} body={self.body!r}')


class ClientResponse:
    def __init__(self, client_response: aiohttp.ClientResponse):
        self.client_response = client_response

    @property
    def status(self) -> int:
        return self.client_response.status

    @property
    def headers(self):
        return self.client_response.headers

    async def release(self) -> None:
        return await self.client_response.release()

    def close(self) -> None:
        self.client_response.close()

    async def read(self) -> bytes:
        return await self.client_response.read()

    async def text(self, encoding: Optional[str] = None,
                   errors: str = 'strict'):
        return await self.client_response.text(encoding=encoding,
                                               errors=errors)

    async def json(self):
        import json as _json
        data = await self.read()
        return _json.loads(data) if data else None

    async def __aenter__(self) -> 'ClientResponse':
        return self

    async def __aexit__(self, exc_type: Optional[Type[BaseException]],
                        exc_val: Optional[BaseException],
                        exc_tb: Optional[TracebackType]) -> None:
        await self.release()


class ClientSession:
    """aiohttp.ClientSession with raise-on-error-status responses."""

    def __init__(self, *args, raise_for_status: bool = True, **kwargs):
        self.raise_for_status = raise_for_status
        self._session_args = (args, kwargs)
        self._session: Optional[aiohttp.ClientSession] = None

    @property
    def client_session(self) -> aiohttp.ClientSession:
        if self._session is None:
            args, kwargs = self._session_args
            kwargs = dict(kwargs)
            kwargs.setdefault(
                'timeout', aiohttp.ClientTimeout(total=5 * 60))
            self._session = aiohttp.ClientSession(
                *args, raise_for_status=False, **kwargs)
        return self._session

    def request(self, method: str, url, *args, **kwargs):
        raise_for_status = kwargs.pop('raise_for_status',
                                      self.raise_for_status)
        return _RequestContext(
            self.client_session.request(method, url, *args, **kwargs),
            raise_for_status)

    def get(self, url, *args, **kwargs):
        return self.request('GET', url, *args, **kwargs)

    def post(self, url, *args, **kwargs):
        return self.request('POST', url, *args, **kwargs)

    def put(self, url, *args, **kwargs):
        return self.request('PUT', url, *args, **kwargs)

    def patch(self, url, *args, **kwargs):
        return self.request('PATCH', url, *args, **kwargs)

    def delete(self, url, *args, **kwargs):
        return self.request('DELETE', url, *args, **kwargs)

    def head(self, url, *args, **kwargs):
        return self.request('HEAD', url, *args, **kwargs)

    def options(self, url, *args, **kwargs):
        return self.request('OPTIONS', url, *args, **kwargs)

    async def close(self) -> None:
        if self._session is not None:
            await self._session.close()
            self._session = None

    async def __aenter__(self) -> 'ClientSession':
        return self

    async def __aexit__(self, exc_type, exc_val, exc_tb) -> None:
        await self.close()


class _RequestContext:
    """Awaitable/async-context wrapper that applies raise_for_status with
    the body attached (the reference ClientResponseError contract)."""

    def __init__(self, coro_ctx, raise_for_status: bool):
        self._ctx = coro_ctx
        self._raise = raise_for_status
        self._resp: Optional[ClientResponse] = None

    async def _start(self) -> ClientResponse:
        resp = await self._ctx
        if self._raise and resp.status >= 400:
            body = (await resp.read()).decode('utf-8', 'replace')
            resp.release()
            raise ClientResponseError(
                resp.request_info, resp.history, body=body,
                status=resp.status, message=resp.reason or '',
                headers=resp.headers)
        self._resp = ClientResponse(resp)
        return self._resp

    def __await__(self):
        return self._start().__await__()

    async def __aenter__(self) -> ClientResponse:
        return await self._start()

    async def __aexit__(self, exc_type, exc_val, exc_tb) -> None:
        if self._resp is not None:
            await self._resp.release()


def client_session(*args, **kwargs) -> ClientSession:
    return ClientSession(*args, **kwargs)
