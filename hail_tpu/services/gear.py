"""Shared service auth plumbing (reference gear/gear/auth.py): bearer-token
parsing and handler decorators that resolve the session token to userdata —
against the local AuthService (the reference resolves against the auth
service over HTTP from each service pod)."""

from __future__ import annotations

import functools
from typing import Optional

from aiohttp import web


def maybe_parse_bearer_header(value: str) -> Optional[str]:
    prefix = 'Bearer '
    if value and value.startswith(prefix):
        return value[len(prefix):]
    return None


async def get_session_id(request: web.Request) -> Optional[str]:
    auth_header = request.headers.get('Authorization')
    if auth_header:
        return maybe_parse_bearer_header(auth_header)
    return request.cookies.get('session')


class Authenticator:
    """Resolves a request's session token to userdata. `userinfo_fn` is an
    async callable session_id -> Optional[dict] — the AuthService's own
    lookup in-process, or an HTTP client for a remote service."""

    def __init__(self, userinfo_fn):
        self._userinfo = userinfo_fn

    def authenticated_users_only(self, fun):
        @functools.wraps(fun)
        async def wrapped(request: web.Request):
            session_id = await get_session_id(request)
            userdata = None
            if session_id:
                userdata = await self._userinfo(session_id)
            if userdata is None:
                raise web.HTTPUnauthorized(reason='not authenticated')
            return await fun(request, userdata)
        return wrapped

    def authenticated_developers_only(self, fun):
        @self.authenticated_users_only
        @functools.wraps(fun)
        async def wrapped(request: web.Request, userdata):
            if not userdata.get('is_developer'):
                raise web.HTTPForbidden(reason='developer role required')
            return await fun(request, userdata)
        return wrapped

    def maybe_authenticated_user(self, fun):
        @functools.wraps(fun)
        async def wrapped(request: web.Request):
            session_id = await get_session_id(request)
            userdata = await self._userinfo(session_id) if session_id else None
            return await fun(request, userdata)
        return wrapped
