"""The Batch service facade: sqlite state + front end + driver on one host.

Split along the reference's three-process structure:
  * `front_end.py` — REST/UI routes (reference `batch/front_end/`)
  * `driver.py` — scheduler, autoscaler, canceller (reference `batch/driver/`)
  * `worker.py` — per-attempt subprocess execution (reference `batch/worker/`)

This module owns the sqlite schema (the reference's MySQL, `batch/sql/`)
and the process lifecycle (`BatchService.start/stop/start_in_thread`).
"""

from __future__ import annotations

import asyncio
import os
import sqlite3
import tempfile
import threading
from typing import Optional

from aiohttp import web

from .driver import Driver
from .front_end import FrontEnd

TERMINAL = ('Success', 'Failed', 'Cancelled', 'Error')


class _DB:
    """sqlite job state (reference: MySQL schema, batch/sql/000-initial.sql
    + 124 migrations; here one consolidated schema)."""

    def __init__(self, path: str):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._lock = threading.Lock()
        with self._lock:
            self._conn.executescript('''
                CREATE TABLE IF NOT EXISTS batches (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    user TEXT NOT NULL DEFAULT 'test',
                    billing_project TEXT NOT NULL DEFAULT 'local',
                    token TEXT,
                    attributes TEXT NOT NULL DEFAULT '{}',
                    callback TEXT,
                    state TEXT NOT NULL DEFAULT 'open',
                    cancelled INTEGER NOT NULL DEFAULT 0,
                    cancel_after_n_failures INTEGER,
                    n_jobs INTEGER NOT NULL DEFAULT 0,
                    time_created INTEGER, time_closed INTEGER,
                    time_completed INTEGER);
                CREATE TABLE IF NOT EXISTS updates (
                    batch_id INTEGER NOT NULL, update_id INTEGER NOT NULL,
                    token TEXT,
                    start_job_id INTEGER NOT NULL,
                    n_jobs INTEGER NOT NULL DEFAULT 0,
                    start_job_group_id INTEGER NOT NULL DEFAULT 1,
                    n_job_groups INTEGER NOT NULL DEFAULT 0,
                    committed INTEGER NOT NULL DEFAULT 0,
                    PRIMARY KEY (batch_id, update_id));
                CREATE TABLE IF NOT EXISTS jobs (
                    batch_id INTEGER NOT NULL, job_id INTEGER NOT NULL,
                    update_id INTEGER NOT NULL DEFAULT 0,
                    job_group_id INTEGER NOT NULL DEFAULT 0,
                    spec TEXT NOT NULL,
                    state TEXT NOT NULL DEFAULT 'Pending',
                    exit_code INTEGER,
                    attempts INTEGER NOT NULL DEFAULT 0,
                    n_max_attempts INTEGER NOT NULL DEFAULT 20,
                    always_run INTEGER NOT NULL DEFAULT 0,
                    parents TEXT NOT NULL DEFAULT '[]',
                    committed INTEGER NOT NULL DEFAULT 1,
                    status TEXT, logs TEXT, error TEXT,
                    duration_ms INTEGER,
                    time_started INTEGER, time_completed INTEGER,
                    PRIMARY KEY (batch_id, job_id));
                CREATE TABLE IF NOT EXISTS job_groups (
                    batch_id INTEGER NOT NULL,
                    job_group_id INTEGER NOT NULL,
                    update_id INTEGER NOT NULL DEFAULT 0,
                    parent_id INTEGER,
                    attributes TEXT NOT NULL DEFAULT '{}',
                    callback TEXT,
                    cancel_after_n_failures INTEGER,
                    cancelled INTEGER NOT NULL DEFAULT 0,
                    state TEXT NOT NULL DEFAULT 'running',
                    time_created INTEGER, time_completed INTEGER,
                    PRIMARY KEY (batch_id, job_group_id));
                CREATE TABLE IF NOT EXISTS attempts (
                    batch_id INTEGER NOT NULL, job_id INTEGER NOT NULL,
                    attempt_id TEXT NOT NULL,
                    start_time INTEGER, end_time INTEGER, reason TEXT,
                    PRIMARY KEY (batch_id, job_id, attempt_id));
                CREATE TABLE IF NOT EXISTS billing_projects (
                    name TEXT PRIMARY KEY,
                    limit_cost REAL,
                    status TEXT NOT NULL DEFAULT 'open',
                    users TEXT NOT NULL DEFAULT '[]');
            ''')

    def execute(self, sql, args=()):
        with self._lock:
            cur = self._conn.execute(sql, args)
            self._conn.commit()
            return cur

    def query(self, sql, args=()):
        with self._lock:
            return self._conn.execute(sql, args).fetchall()

    def close(self):
        with self._lock:
            self._conn.close()


class BatchService:
    """Front end + driver + workers. Run with `async with` or start()/stop(),
    or `BatchService.start_in_thread()` from sync code.

    `auth_url` (optional) points at an AuthService; when set, /api routes
    require a valid Bearer session token, verified against
    {auth_url}/api/v1alpha/userinfo (the reference batch front end's
    rest_authenticated_users_only, gear/auth.py). Also serves /metrics
    (Prometheus text) and HTML pages at /batches, /batches/{id}."""

    def __init__(self, port: int = 0, n_workers: int = 4,
                 data_dir: Optional[str] = None,
                 auth_url: Optional[str] = None,
                 min_workers: int = 1,
                 max_workers: Optional[int] = None,
                 default_user: str = 'test'):
        self.requested_port = port
        self.port: Optional[int] = None
        self.n_workers = n_workers
        self.auth_url = auth_url.rstrip('/') if auth_url else None
        self.data_dir = data_dir or tempfile.mkdtemp(prefix='hail_tpu_batch_svc_')
        os.makedirs(os.path.join(self.data_dir, 'logs'), exist_ok=True)
        self.db = _DB(os.path.join(self.data_dir, 'state.db'))
        self.driver = Driver(self.db, self.data_dir, min_workers=min_workers,
                             n_workers=n_workers, max_workers=max_workers)
        self.front_end = FrontEnd(self.db, self.driver, auth_url=self.auth_url,
                                  default_user=default_user)
        self._app = self.front_end.build_app()
        self._runner: Optional[web.AppRunner] = None
        self._stopped = False

    # back-compat accessors (older tests poked these on the monolith)
    @property
    def _running_procs(self):
        return self.driver.running

    # -- lifecycle -----------------------------------------------------------
    async def start(self) -> int:
        self._runner = web.AppRunner(self._app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, '127.0.0.1', self.requested_port)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        self.driver.start()
        return self.port

    async def stop(self):
        self._stopped = True
        await self.driver.stop()
        if self._runner:
            await self._runner.cleanup()
        self.db.close()

    async def __aenter__(self) -> 'BatchService':
        await self.start()
        return self

    async def __aexit__(self, exc_type, exc_val, exc_tb):
        await self.stop()

    @classmethod
    def start_in_thread(cls, **kwargs) -> 'BatchService':
        """Run the service on a dedicated event-loop thread; returns once the
        port is bound. `svc.shutdown()` stops it."""
        svc = cls(**kwargs)
        started = threading.Event()

        def run():
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            svc._loop = loop
            loop.run_until_complete(svc.start())
            started.set()
            loop.run_forever()
        t = threading.Thread(target=run, daemon=True, name='batch-service')
        t.start()
        started.wait(timeout=30)
        svc._thread = t
        return svc

    def shutdown(self):
        loop = getattr(self, '_loop', None)
        if loop is None:
            return
        fut = asyncio.run_coroutine_threadsafe(self.stop(), loop)
        try:
            fut.result(timeout=10)
        except Exception:
            pass
        loop.call_soon_threadsafe(loop.stop)
