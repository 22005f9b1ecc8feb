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


# ---------------------------------------------------------------------------
# CSRF (reference gear/gear/csrf.py): cookie-authed mutating requests must
# present a double-submit token — `_csrf` cookie matching either the
# X-CSRF-Token header (JSON clients) or the `_csrf` form field
# ---------------------------------------------------------------------------

def new_csrf_token() -> str:
    import secrets
    return secrets.token_urlsafe(64)


def check_csrf_token(handler_wrapper=None):
    """aiohttp middleware factory; use `app.middlewares.append(
    gear.csrf_middleware)`."""
    return csrf_middleware


try:
    from aiohttp import web as _web

    @_web.middleware
    async def csrf_middleware(request, handler):
        if request.cookies and request.method not in ('GET', 'HEAD', 'OPTIONS'):
            token1 = request.cookies.get('_csrf')
            token2 = request.headers.get('X-CSRF-Token')
            if token2 is None:
                post = await request.post()
                token2 = post.get('_csrf')
            if token1 is None or token2 is None or token1 != token2:
                raise _web.HTTPUnauthorized(reason='invalid csrf token')
        return await handler(request)
except Exception:                                    # pragma: no cover
    csrf_middleware = None


# ---------------------------------------------------------------------------
# Signed-cookie sessions (reference gear/gear/session.py uses
# EncryptedCookieStorage; scoped analogue: HMAC-signed JSON payloads —
# tamper-proof, not secret, which is what the services store needs)
# ---------------------------------------------------------------------------

class CookieSessions:
    def __init__(self, secret: bytes, cookie_name: str = 'session',
                 max_age: int = 30 * 24 * 3600):
        self._secret = secret
        self.cookie_name = cookie_name
        self.max_age = max_age

    def _sign(self, payload: bytes) -> str:
        import base64
        import hashlib
        import hmac
        mac = hmac.new(self._secret, payload, hashlib.sha256).digest()
        return (base64.urlsafe_b64encode(payload).decode() + '.'
                + base64.urlsafe_b64encode(mac).decode())

    def encode(self, data: dict) -> str:
        import json
        return self._sign(json.dumps(data, sort_keys=True).encode())

    def decode(self, cookie: str):
        import base64
        import hashlib
        import hmac
        import json
        try:
            payload_b64, mac_b64 = cookie.split('.', 1)
            payload = base64.urlsafe_b64decode(payload_b64)
            mac = base64.urlsafe_b64decode(mac_b64)
        except Exception:
            return None
        good = hmac.new(self._secret, payload, hashlib.sha256).digest()
        if not hmac.compare_digest(mac, good):
            return None
        return json.loads(payload)

    def set_cookie(self, response, data: dict) -> None:
        response.set_cookie(self.cookie_name, self.encode(data),
                            httponly=True, samesite='Lax',
                            max_age=self.max_age)

    def get(self, request):
        cookie = request.cookies.get(self.cookie_name)
        return self.decode(cookie) if cookie else None


# ---------------------------------------------------------------------------
# TimeLimitedMaxSizeCache (reference gear/gear/time_limited_max_size_cache.py):
# async load-through cache with TTL expiry, slot-count eviction, and
# in-flight request coalescing
# ---------------------------------------------------------------------------

class TimeLimitedMaxSizeCache:
    def __init__(self, load, lifetime_ns: int, num_slots: int,
                 cache_name: str = 'cache'):
        assert lifetime_ns > 0 and num_slots > 0
        self.load = load
        self.lifetime_ns = lifetime_ns
        self.num_slots = num_slots
        self.cache_name = cache_name
        self._futures = {}
        self._cache = {}
        self._expiry = {}
        self.hits = 0
        self.misses = 0
        self.evictions = 0
        self._shutting_down = False

    async def shutdown(self):
        import asyncio
        self._shutting_down = True
        if self._futures:
            await asyncio.wait(list(self._futures.values()))
        assert not self._futures

    async def lookup(self, k):
        import asyncio
        import time
        if self._shutting_down:
            raise ValueError('Cache is shutting down.')
        if k in self._expiry and self._expiry[k] <= time.monotonic_ns():
            del self._cache[k]
            del self._expiry[k]
        if k in self._cache:
            self.hits += 1
            return self._cache[k]
        self.misses += 1
        if k in self._futures:
            return await self._futures[k]
        self._futures[k] = asyncio.ensure_future(self.load(k))
        try:
            v = await self._futures[k]
        finally:
            del self._futures[k]
        self._cache[k] = v
        self._expiry[k] = time.monotonic_ns() + self.lifetime_ns
        if len(self._cache) > self.num_slots:
            self.evictions += 1
            oldest = min(self._expiry, key=self._expiry.get)
            del self._cache[oldest]
            del self._expiry[oldest]
        return v
