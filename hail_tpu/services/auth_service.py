"""The identity service (reference auth/auth/auth.py): users + session
tokens behind the reference's /api/v1alpha routes, on sqlite. The
reference's OAuth login (auth.py:394-493) needs an external IdP; the
zero-egress analogue is POST /api/v1alpha/login issuing a session token
directly for a known user, plus the reference's copy-paste-token exchange
(auth.py:539-567) verbatim in shape.

Routes:
    GET    /healthcheck
    POST   /api/v1alpha/login              {'username'} -> {'token'}
    POST   /api/v1alpha/logout
    GET    /api/v1alpha/userinfo           (Bearer) -> userdata
    POST   /api/v1alpha/copy-paste-token   (Bearer) -> short-lived token
    POST   /api/v1alpha/copy-paste-login   {'token'} -> {'token': session}
    GET    /api/v1alpha/users              (developers)
    GET    /api/v1alpha/users/{user}       (developers)
    POST   /api/v1alpha/users/{user}/create (developers)
    DELETE /api/v1alpha/users/{user}       (developers)
    GET    /metrics
"""

from __future__ import annotations

import asyncio
import secrets
import threading
import time
from typing import Optional

from aiohttp import web

from .database import Database
from .gear import Authenticator
from .metrics import metrics_handler, monitor_endpoints_middleware

SCHEMA = '''
CREATE TABLE IF NOT EXISTS users (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    username TEXT NOT NULL UNIQUE,
    login_id TEXT,
    state TEXT NOT NULL DEFAULT 'active',
    is_developer INTEGER NOT NULL DEFAULT 0,
    is_service_account INTEGER NOT NULL DEFAULT 0,
    hail_identity TEXT,
    time_created REAL
);
CREATE TABLE IF NOT EXISTS sessions (
    session_id TEXT PRIMARY KEY,
    user_id INTEGER NOT NULL,
    max_age_secs REAL,
    time_created REAL NOT NULL
);
'''


def _userdata(row: dict) -> dict:
    return {
        'id': row['id'],
        'username': row['username'],
        'login_id': row['login_id'],
        'state': row['state'],
        'is_developer': bool(row['is_developer']),
        'is_service_account': bool(row['is_service_account']),
        'hail_identity': row['hail_identity'] or f"{row['username']}@local",
    }


class AuthService:
    def __init__(self, port: int = 0, db_path: str = ':memory:',
                 initial_developer: str = 'dev'):
        self.requested_port = port
        self.port: Optional[int] = None
        self.db_path = db_path
        self.initial_developer = initial_developer
        self.db = Database()
        self.authenticator = Authenticator(self.userinfo)
        self._app = self._build_app()
        self._runner: Optional[web.AppRunner] = None

    # -- core lookups -------------------------------------------------------
    async def userinfo(self, session_id: str) -> Optional[dict]:
        row = await self.db.execute_and_fetchone(
            'SELECT u.*, s.time_created st, s.max_age_secs FROM sessions s '
            'JOIN users u ON u.id = s.user_id WHERE s.session_id = ?',
            (session_id,))
        if row is None or row['state'] != 'active':
            return None
        if row['max_age_secs'] is not None and \
                time.time() - row['st'] > row['max_age_secs']:
            await self.db.just_execute(
                'DELETE FROM sessions WHERE session_id = ?', (session_id,))
            return None
        return _userdata(row)

    async def _create_session(self, user_id: int,
                              max_age_secs: Optional[float] = None) -> str:
        session_id = secrets.token_urlsafe(32)
        await self.db.just_execute(
            'INSERT INTO sessions (session_id, user_id, max_age_secs, '
            'time_created) VALUES (?, ?, ?, ?)',
            (session_id, user_id, max_age_secs, time.time()))
        return session_id

    async def _insert_user(self, username: str, login_id=None,
                           is_developer=False, is_service_account=False):
        return await self.db.execute_insertone(
            'INSERT INTO users (username, login_id, is_developer, '
            'is_service_account, hail_identity, time_created) '
            'VALUES (?, ?, ?, ?, ?, ?)',
            (username, login_id, int(is_developer), int(is_service_account),
             f'{username}@local', time.time()))

    # -- handlers -----------------------------------------------------------
    def _build_app(self) -> web.Application:
        app = web.Application(middlewares=[monitor_endpoints_middleware()])
        auth = self.authenticator
        r = app.router
        r.add_get('/healthcheck', self._healthcheck)
        r.add_get('/metrics', metrics_handler)
        r.add_post('/api/v1alpha/login', self._login)
        r.add_post('/api/v1alpha/logout',
                   auth.authenticated_users_only(self._logout))
        r.add_get('/api/v1alpha/userinfo',
                  auth.authenticated_users_only(self._userinfo_route))
        r.add_post('/api/v1alpha/copy-paste-token',
                   auth.authenticated_users_only(self._copy_paste_token))
        r.add_post('/api/v1alpha/copy-paste-login', self._copy_paste_login)
        r.add_get('/api/v1alpha/users',
                  auth.authenticated_developers_only(self._get_users))
        r.add_get('/api/v1alpha/users/{user}',
                  auth.authenticated_developers_only(self._get_user))
        r.add_post('/api/v1alpha/users/{user}/create',
                   auth.authenticated_developers_only(self._create_user))
        r.add_delete('/api/v1alpha/users/{user}',
                     auth.authenticated_developers_only(self._delete_user))
        return app

    async def _healthcheck(self, request) -> web.Response:
        return web.Response()

    async def _login(self, request) -> web.Response:
        body = await request.json()
        username = body.get('username')
        row = await self.db.execute_and_fetchone(
            'SELECT * FROM users WHERE username = ?', (username,))
        if row is None or row['state'] != 'active':
            raise web.HTTPUnauthorized(reason=f'unknown user {username!r}')
        token = await self._create_session(row['id'])
        return web.json_response({'token': token,
                                  'username': row['username']})

    async def _logout(self, request, userdata) -> web.Response:
        from .gear import get_session_id
        session_id = await get_session_id(request)
        await self.db.just_execute(
            'DELETE FROM sessions WHERE session_id = ?', (session_id,))
        return web.json_response({})

    async def _userinfo_route(self, request, userdata) -> web.Response:
        return web.json_response(userdata)

    async def _copy_paste_token(self, request, userdata) -> web.Response:
        # short-lived exchangeable token (reference create_copy_paste_token,
        # max_age_secs=300)
        token = await self._create_session(userdata['id'], max_age_secs=300)
        return web.json_response({'token': token})

    async def _copy_paste_login(self, request) -> web.Response:
        body = await request.json()
        info = await self.userinfo(body.get('token', ''))
        if info is None:
            raise web.HTTPUnauthorized(reason='invalid or expired token')
        await self.db.just_execute(
            'DELETE FROM sessions WHERE session_id = ?', (body['token'],))
        token = await self._create_session(info['id'])
        return web.json_response({'token': token, 'username': info['username']})

    async def _get_users(self, request, userdata) -> web.Response:
        users = [_userdata(u) async for u in self.db.execute_and_fetchall(
            'SELECT * FROM users ORDER BY id')]
        return web.json_response({'users': users})

    async def _get_user(self, request, userdata) -> web.Response:
        row = await self.db.execute_and_fetchone(
            'SELECT * FROM users WHERE username = ?',
            (request.match_info['user'],))
        if row is None:
            raise web.HTTPNotFound()
        return web.json_response(_userdata(row))

    async def _create_user(self, request, userdata) -> web.Response:
        username = request.match_info['user']
        body = await request.json() if request.can_read_body else {}
        existing = await self.db.execute_and_fetchone(
            'SELECT id FROM users WHERE username = ?', (username,))
        if existing is not None:
            raise web.HTTPConflict(reason=f'user {username!r} already exists')
        await self._insert_user(
            username, body.get('login_id'),
            bool(body.get('is_developer')),
            bool(body.get('is_service_account')))
        return web.json_response({})

    async def _delete_user(self, request, userdata) -> web.Response:
        n = await self.db.execute_update(
            "UPDATE users SET state = 'deleted' WHERE username = ?",
            (request.match_info['user'],))
        if n == 0:
            raise web.HTTPNotFound()
        return web.json_response({})

    # -- lifecycle ----------------------------------------------------------
    async def start(self) -> int:
        await self.db.async_init(self.db_path)
        await self.db.execute_script(SCHEMA)
        if self.initial_developer:
            existing = await self.db.execute_and_fetchone(
                'SELECT id FROM users WHERE username = ?',
                (self.initial_developer,))
            if existing is None:
                await self._insert_user(self.initial_developer,
                                        is_developer=True)
        self._runner = web.AppRunner(self._app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, '127.0.0.1', self.requested_port)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        return self.port

    async def stop(self) -> None:
        if self._runner:
            await self._runner.cleanup()
        await self.db.async_close()

    @classmethod
    def start_in_thread(cls, **kwargs) -> 'AuthService':
        svc = cls(**kwargs)
        started = threading.Event()

        def run():
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            svc._loop = loop
            loop.run_until_complete(svc.start())
            started.set()
            loop.run_forever()
        t = threading.Thread(target=run, daemon=True, name='auth-service')
        t.start()
        started.wait(timeout=30)
        svc._thread = t
        return svc

    def shutdown(self) -> None:
        loop = getattr(self, '_loop', None)
        if loop is None:
            return
        fut = asyncio.run_coroutine_threadsafe(self.stop(), loop)
        try:
            fut.result(timeout=10)
        except Exception:
            pass
        loop.call_soon_threadsafe(loop.stop)
