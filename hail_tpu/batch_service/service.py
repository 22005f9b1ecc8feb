"""The Batch service: REST front end + driver + worker pool on one host.

Route shapes follow the reference front end
(`/root/reference/batch/batch/front_end/front_end.py`):

    POST   /api/v1alpha/batches/create
    POST   /api/v1alpha/batches/{batch_id}/jobs/create
    PATCH  /api/v1alpha/batches/{batch_id}/close
    GET    /api/v1alpha/batches/{batch_id}
    GET    /api/v1alpha/batches/{batch_id}/jobs
    GET    /api/v1alpha/batches/{batch_id}/jobs/{job_id}
    GET    /api/v1alpha/batches/{batch_id}/jobs/{job_id}/log
    PATCH  /api/v1alpha/batches/{batch_id}/cancel
    DELETE /api/v1alpha/batches/{batch_id}

Job state machine mirrors the reference: Pending -> Ready -> Running ->
Success | Failed | Cancelled | Error. Retries honor `n_max_attempts`
(reference worker re-attempts), `cancel_after_n_failures` cancels the batch
(front_end.py create validation), parents gate scheduling (DAG), and
`always_run` jobs execute even after parent failure or batch cancellation.
Scheduling is fair-share across open batches: each scheduling round grants
slots to the batch with the fewest running jobs first (the single-node
analogue of PoolScheduler._compute_fair_share, pool.py:493-605).
"""

from __future__ import annotations

import asyncio
import json
import os
import signal
import sqlite3
import subprocess
import tempfile
import threading
import time
from typing import Dict, List, Optional

from aiohttp import web

TERMINAL = ('Success', 'Failed', 'Cancelled', 'Error')


class _DB:
    """sqlite job state (reference: MySQL schema, batch/sql/000-initial.sql)."""

    def __init__(self, path: str):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._lock = threading.Lock()
        with self._lock:
            self._conn.executescript('''
                CREATE TABLE IF NOT EXISTS batches (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    attributes TEXT, billing_project TEXT,
                    state TEXT NOT NULL DEFAULT 'open',
                    cancel_after_n_failures INTEGER,
                    n_jobs INTEGER NOT NULL DEFAULT 0,
                    time_created REAL, time_closed REAL, time_completed REAL);
                CREATE TABLE IF NOT EXISTS jobs (
                    batch_id INTEGER NOT NULL, job_id INTEGER NOT NULL,
                    spec TEXT NOT NULL, state TEXT NOT NULL DEFAULT 'Pending',
                    exit_code INTEGER, attempts INTEGER NOT NULL DEFAULT 0,
                    n_max_attempts INTEGER NOT NULL DEFAULT 1,
                    always_run INTEGER NOT NULL DEFAULT 0,
                    parents TEXT NOT NULL DEFAULT '[]',
                    log_path TEXT, error TEXT,
                    time_started REAL, time_completed REAL,
                    job_group_id INTEGER NOT NULL DEFAULT 0,
                    PRIMARY KEY (batch_id, job_id));
                CREATE TABLE IF NOT EXISTS job_groups (
                    batch_id INTEGER NOT NULL,
                    job_group_id INTEGER NOT NULL,
                    parent_id INTEGER,
                    attributes TEXT NOT NULL DEFAULT '{}',
                    cancel_after_n_failures INTEGER,
                    state TEXT NOT NULL DEFAULT 'running',
                    PRIMARY KEY (batch_id, job_group_id));
                CREATE TABLE IF NOT EXISTS billing_projects (
                    name TEXT PRIMARY KEY,
                    limit_cost REAL,
                    status TEXT NOT NULL DEFAULT 'open');
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
    (Prometheus text) and HTML pages at /batches, /batches/{id}
    (reference front_end ui_batches/ui_batch via web_common templates)."""

    def __init__(self, port: int = 0, n_workers: int = 4,
                 data_dir: Optional[str] = None,
                 auth_url: Optional[str] = None):
        self.requested_port = port
        self.port: Optional[int] = None
        self.n_workers = n_workers
        self.auth_url = auth_url.rstrip('/') if auth_url else None
        self.data_dir = data_dir or tempfile.mkdtemp(prefix='hail_tpu_batch_svc_')
        os.makedirs(os.path.join(self.data_dir, 'logs'), exist_ok=True)
        self.db = _DB(os.path.join(self.data_dir, 'state.db'))
        self._app = self._build_app()
        self._runner: Optional[web.AppRunner] = None
        self._driver_task: Optional[asyncio.Task] = None
        self._running_procs: Dict[tuple, subprocess.Popen] = {}
        self._wake = asyncio.Event()
        self._stopped = False

    # -- REST front end -----------------------------------------------------
    def _auth_middleware(self):
        import aiohttp as _aiohttp
        from ..services.gear import get_session_id

        @web.middleware
        async def middleware(request, handler):
            if not request.path.startswith('/api/'):
                return await handler(request)
            session_id = await get_session_id(request)
            if not session_id:
                raise web.HTTPUnauthorized(reason='not authenticated')
            async with _aiohttp.ClientSession() as s:
                async with s.get(
                        f'{self.auth_url}/api/v1alpha/userinfo',
                        headers={'Authorization': f'Bearer {session_id}'}) as resp:
                    if resp.status != 200:
                        raise web.HTTPUnauthorized(reason='invalid token')
                    request['userdata'] = await resp.json()
            return await handler(request)
        return middleware

    def _build_app(self) -> web.Application:
        from ..services.metrics import monitor_endpoints_middleware
        middlewares = [monitor_endpoints_middleware()]
        if self.auth_url:
            middlewares.append(self._auth_middleware())
        app = web.Application(middlewares=middlewares)
        r = app.router
        r.add_get('/healthcheck', self._healthcheck)
        r.add_get('/metrics', self._metrics)
        r.add_get('/batches', self._ui_batches)
        r.add_get('/batches/{batch_id}', self._ui_batch)
        r.add_post('/api/v1alpha/batches/create', self._create_batch)
        r.add_post('/api/v1alpha/batches/{batch_id}/jobs/create', self._create_jobs)
        r.add_patch('/api/v1alpha/batches/{batch_id}/close', self._close_batch)
        r.add_get('/api/v1alpha/batches', self._list_batches)
        r.add_get('/api/v1alpha/batches/{batch_id}', self._get_batch)
        r.add_get('/api/v1alpha/batches/{batch_id}/jobs', self._list_jobs)
        r.add_get('/api/v1alpha/batches/{batch_id}/jobs/{job_id}', self._get_job)
        r.add_get('/api/v1alpha/batches/{batch_id}/jobs/{job_id}/log', self._get_log)
        r.add_patch('/api/v1alpha/batches/{batch_id}/cancel', self._cancel_batch)
        r.add_delete('/api/v1alpha/batches/{batch_id}', self._delete_batch)
        # nested job groups (reference front_end.py:1569-2100)
        r.add_post('/api/v1alpha/batches/{batch_id}/job-groups/create',
                   self._create_job_groups)
        r.add_get('/api/v1alpha/batches/{batch_id}/job-groups/{group_id}',
                  self._get_job_group)
        r.add_get('/api/v1alpha/batches/{batch_id}/job-groups/{group_id}/job-groups',
                  self._list_child_job_groups)
        r.add_get('/api/v1alpha/batches/{batch_id}/job-groups/{group_id}/jobs',
                  self._list_job_group_jobs)
        r.add_patch('/api/v1alpha/batches/{batch_id}/job-groups/{group_id}/cancel',
                    self._cancel_job_group)
        # resource usage + billing (reference front_end resource_usage /
        # billing_projects endpoints)
        r.add_get('/api/v1alpha/batches/{batch_id}/jobs/{job_id}/resource_usage',
                  self._job_resource_usage)
        r.add_get('/api/v1alpha/billing_projects', self._list_billing_projects)
        r.add_get('/api/v1alpha/billing_projects/{name}',
                  self._get_billing_project)
        r.add_post('/api/v1alpha/billing_projects/{name}/edit',
                   self._edit_billing_project)
        return app

    # -- nested job groups ---------------------------------------------------
    def _group_row(self, bid: int, gid: int):
        rows = self.db.query(
            'SELECT * FROM job_groups WHERE batch_id = ? AND job_group_id = ?',
            (bid, gid))
        if not rows:
            if gid == 0:
                # implicit root group of every batch
                self._batch_row(bid)
                self.db.execute(
                    'INSERT OR IGNORE INTO job_groups (batch_id, job_group_id, '
                    'parent_id) VALUES (?, 0, NULL)', (bid,))
                return self._group_row(bid, gid)
            raise web.HTTPNotFound(reason=f'job group {bid}/{gid} not found')
        return rows[0]

    def _descendant_groups(self, bid: int, gid: int) -> List[int]:
        """gid plus all transitive child group ids."""
        children: Dict[Optional[int], List[int]] = {}
        for r in self.db.query(
                'SELECT job_group_id, parent_id FROM job_groups '
                'WHERE batch_id = ?', (bid,)):
            children.setdefault(r['parent_id'], []).append(r['job_group_id'])
        out, stack = [], [gid]
        while stack:
            g = stack.pop()
            out.append(g)
            stack.extend(children.get(g, []))
        return out

    async def _create_job_groups(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        b = self._batch_row(bid)
        if b['state'] not in ('open', 'running'):
            raise web.HTTPBadRequest(reason=f'batch {bid} is {b["state"]}')
        payload = await req.json()
        bunch = payload['bunch'] if 'bunch' in payload else payload
        self._group_row(bid, 0)
        created = []
        for gspec in bunch:
            gid = int(gspec['job_group_id'])
            parent = int(gspec.get('absolute_parent_id', 0))
            self._group_row(bid, parent)      # parent must exist
            self.db.execute(
                'INSERT INTO job_groups (batch_id, job_group_id, parent_id, '
                'attributes, cancel_after_n_failures) VALUES (?, ?, ?, ?, ?)',
                (bid, gid, parent,
                 json.dumps(gspec.get('attributes') or {}),
                 gspec.get('cancel_after_n_failures')))
            created.append(gid)
        return web.json_response({'job_group_ids': created})

    def _job_group_status(self, bid: int, gid: int) -> dict:
        g = self._group_row(bid, gid)
        gids = self._descendant_groups(bid, gid)
        qmarks = ','.join('?' * len(gids))
        counts = {s: 0 for s in
                  ('Pending', 'Ready', 'Running', 'Success', 'Failed',
                   'Cancelled', 'Error')}
        for r in self.db.query(
                f'SELECT state, COUNT(*) c FROM jobs WHERE batch_id = ? AND '
                f'job_group_id IN ({qmarks}) GROUP BY state', (bid, *gids)):
            counts[r['state']] = r['c']
        n_jobs = sum(counts.values())
        n_done = sum(counts[s] for s in TERMINAL)
        return {
            'batch_id': bid, 'job_group_id': gid, 'state': g['state'],
            'attributes': json.loads(g['attributes']),
            'cancel_after_n_failures': g['cancel_after_n_failures'],
            'n_jobs': n_jobs, 'n_completed': n_done,
            'n_succeeded': counts['Success'],
            'n_failed': counts['Failed'] + counts['Error'],
            'n_cancelled': counts['Cancelled'],
            'complete': n_jobs > 0 and n_done == n_jobs,
            'cost': self._cost_of(bid, gids),
        }

    async def _get_job_group(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        gid = int(req.match_info['group_id'])
        return web.json_response(self._job_group_status(bid, gid))

    async def _list_child_job_groups(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        gid = int(req.match_info['group_id'])
        self._group_row(bid, gid)
        rows = self.db.query(
            'SELECT job_group_id FROM job_groups WHERE batch_id = ? AND '
            'parent_id = ? ORDER BY job_group_id', (bid, gid))
        return web.json_response({'job_groups': [
            self._job_group_status(bid, r['job_group_id']) for r in rows]})

    async def _list_job_group_jobs(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        gid = int(req.match_info['group_id'])
        self._group_row(bid, gid)
        gids = self._descendant_groups(bid, gid)
        qmarks = ','.join('?' * len(gids))
        rows = self.db.query(
            f'SELECT * FROM jobs WHERE batch_id = ? AND job_group_id IN '
            f'({qmarks}) ORDER BY job_id', (bid, *gids))
        return web.json_response({'jobs': [self._job_json(r) for r in rows]})

    async def _cancel_job_group(self, req: web.Request) -> web.Response:
        """Cancel-fast: the group and every descendant group — non-always-run
        pending jobs flip to Cancelled, running processes are terminated
        (reference front_end cancel-fast propagation)."""
        bid = int(req.match_info['batch_id'])
        gid = int(req.match_info['group_id'])
        self._group_row(bid, gid)
        gids = self._descendant_groups(bid, gid)
        qmarks = ','.join('?' * len(gids))
        self.db.execute(
            f'UPDATE job_groups SET state = ? WHERE batch_id = ? AND '
            f'job_group_id IN ({qmarks})', ('cancelled', bid, *gids))
        self.db.execute(
            f"UPDATE jobs SET state = 'Cancelled' WHERE batch_id = ? AND "
            f"job_group_id IN ({qmarks}) AND state IN ('Pending', 'Ready') "
            f"AND always_run = 0", (bid, *gids))
        in_group = {r['job_id'] for r in self.db.query(
            f'SELECT job_id FROM jobs WHERE batch_id = ? AND job_group_id IN '
            f'({qmarks})', (bid, *gids))}
        for (b, j), proc in list(self._running_procs.items()):
            if b == bid and j in in_group:
                try:
                    proc.terminate()
                except ProcessLookupError:
                    pass
        self._wake.set()
        return web.json_response({})

    # -- resource usage / billing ---------------------------------------------
    # a flat local "core-hour" rate: jobs here run on host cores, so usage is
    # wall seconds x 1 core (reference: per-resource rates from the cloud
    # pricing tables, front_end resource_usage endpoints)
    _CORE_HOUR_RATE = 0.01

    def _job_usage(self, r) -> dict:
        t0, t1 = r['time_started'], r['time_completed']
        dur = (t1 - t0) if (t0 is not None and t1 is not None) else None
        cost = (dur / 3600.0 * self._CORE_HOUR_RATE) if dur is not None else 0.0
        return {'cpu_seconds': round(dur, 6) if dur is not None else None,
                'cores': 1,
                'cost': round(cost, 10)}

    def _cost_of(self, bid: int, gids: Optional[List[int]] = None) -> float:
        if gids is None:
            rows = self.db.query(
                'SELECT time_started, time_completed FROM jobs '
                'WHERE batch_id = ?', (bid,))
        else:
            qmarks = ','.join('?' * len(gids))
            rows = self.db.query(
                f'SELECT time_started, time_completed FROM jobs WHERE '
                f'batch_id = ? AND job_group_id IN ({qmarks})', (bid, *gids))
        return round(sum(self._job_usage(r)['cost'] for r in rows), 10)

    async def _job_resource_usage(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        jid = int(req.match_info['job_id'])
        rows = self.db.query(
            'SELECT * FROM jobs WHERE batch_id = ? AND job_id = ?', (bid, jid))
        if not rows:
            raise web.HTTPNotFound(reason=f'job {bid}/{jid} not found')
        return web.json_response({'resource_usage': self._job_usage(rows[0])})

    def _billing_project_json(self, name: str) -> dict:
        rows = self.db.query('SELECT * FROM billing_projects WHERE name = ?',
                             (name,))
        limit = rows[0]['limit_cost'] if rows else None
        status = rows[0]['status'] if rows else 'open'
        cost = 0.0
        for b in self.db.query('SELECT id FROM batches WHERE '
                               'billing_project = ?', (name,)):
            cost += self._cost_of(b['id'])
        return {'billing_project': name, 'limit': limit,
                'accrued_cost': round(cost, 10), 'status': status}

    async def _list_billing_projects(self, req: web.Request) -> web.Response:
        names = {r['name'] for r in
                 self.db.query('SELECT name FROM billing_projects')}
        names |= {r['billing_project'] for r in
                  self.db.query('SELECT DISTINCT billing_project FROM batches')}
        return web.json_response(
            [self._billing_project_json(n) for n in sorted(names)])

    async def _get_billing_project(self, req: web.Request) -> web.Response:
        return web.json_response(
            self._billing_project_json(req.match_info['name']))

    async def _edit_billing_project(self, req: web.Request) -> web.Response:
        name = req.match_info['name']
        body = await req.json()
        self.db.execute(
            'INSERT INTO billing_projects (name, limit_cost) VALUES (?, ?) '
            'ON CONFLICT(name) DO UPDATE SET limit_cost = excluded.limit_cost',
            (name, body.get('limit')))
        return web.json_response(self._billing_project_json(name))

    async def _healthcheck(self, req: web.Request) -> web.Response:
        return web.Response()

    async def _metrics(self, req: web.Request) -> web.Response:
        from ..services.metrics import render_metrics
        extra = {'batch_running_jobs': float(len(self._running_procs)),
                 'batch_worker_slots': float(self.n_workers)}
        for r in self.db.query('SELECT state, COUNT(*) c FROM jobs GROUP BY state'):
            extra[f'batch_jobs_{r["state"].lower()}'] = float(r['c'])
        return web.Response(text=render_metrics(extra),
                            content_type='text/plain', charset='utf-8')

    async def _list_batches(self, req: web.Request) -> web.Response:
        ids = [r['id'] for r in
               self.db.query('SELECT id FROM batches ORDER BY id')]
        return web.json_response(
            {'batches': [self._batch_status(i) for i in ids]})

    async def _ui_batches(self, req: web.Request) -> web.Response:
        from ..services.web_common import render_page, render_table
        rows = []
        for r in self.db.query('SELECT id FROM batches ORDER BY id DESC'):
            s = self._batch_status(r['id'])
            rows.append([f'<a href="/batches/{s["id"]}">{s["id"]}</a>',
                         s['state'], s['n_jobs'], s['n_completed'],
                         s['n_failed'], s['billing_project']])
        html = render_table(
            ['id', 'state', 'jobs', 'completed', 'failed', 'billing project'],
            rows, raw_cols=(0,))
        return web.Response(text=render_page('Batches', html),
                            content_type='text/html')

    async def _ui_batch(self, req: web.Request) -> web.Response:
        from html import escape
        from ..services.web_common import render_page, render_table
        bid = int(req.match_info['batch_id'])
        s = self._batch_status(bid)
        rows = []
        for r in self.db.query(
                'SELECT * FROM jobs WHERE batch_id = ? ORDER BY job_id', (bid,)):
            spec = json.loads(r['spec'])
            cmd = spec.get('command')
            cmd = ' '.join(cmd) if isinstance(cmd, list) else (cmd or '')
            rows.append([r['job_id'],
                         f'<span class="state-{escape(r["state"])}">'
                         f'{escape(r["state"])}</span>',
                         r['exit_code'], r['attempts'], cmd[:120]])
        html = (f'<p>state: {escape(s["state"])} — {s["n_completed"]}/'
                f'{s["n_jobs"]} jobs complete</p>'
                + render_table(['job', 'state', 'exit code', 'attempts',
                                'command'], rows, raw_cols=(1,)))
        return web.Response(text=render_page(f'Batch {bid}', html),
                            content_type='text/html')

    async def _create_batch(self, req: web.Request) -> web.Response:
        spec = await req.json()
        canf = spec.get('cancel_after_n_failures')
        if canf is not None and canf < 1:
            raise web.HTTPBadRequest(
                reason=f'cancel_after_n_failures must be >= 1, got {canf}')
        bp = spec.get('billing_project', 'local')
        bpj = self._billing_project_json(bp)
        if bpj['limit'] is not None and bpj['accrued_cost'] >= bpj['limit']:
            raise web.HTTPForbidden(
                reason=f'billing project {bp} has exceeded the budget: '
                       f'accrued={bpj["accrued_cost"]} limit={bpj["limit"]}')
        cur = self.db.execute(
            'INSERT INTO batches (attributes, billing_project, '
            'cancel_after_n_failures, time_created) VALUES (?, ?, ?, ?)',
            (json.dumps(spec.get('attributes') or {}),
             spec.get('billing_project', 'local'), canf, time.time()))
        return web.json_response({'id': cur.lastrowid})

    async def _create_jobs(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        b = self._batch_row(bid)
        if b['state'] != 'open':
            raise web.HTTPBadRequest(reason=f'batch {bid} is not open')
        payload = await req.json()
        bunch = payload['bunch'] if 'bunch' in payload else payload
        created = []
        for jspec in bunch:
            jid = int(jspec['job_id'])
            spec = jspec.get('process') or jspec.get('spec') or jspec
            gid = int(jspec.get('absolute_job_group_id',
                                jspec.get('in_update_job_group_id',
                                          jspec.get('job_group_id', 0))))
            if gid != 0:
                self._group_row(bid, gid)     # group must exist
            self.db.execute(
                'INSERT INTO jobs (batch_id, job_id, spec, n_max_attempts, '
                'always_run, parents, job_group_id) VALUES (?, ?, ?, ?, ?, ?, ?)',
                (bid, jid, json.dumps(spec),
                 int(jspec.get('n_max_attempts', 1)),
                 1 if jspec.get('always_run') else 0,
                 json.dumps(jspec.get('parent_ids', [])), gid))
            created.append(jid)
        self.db.execute('UPDATE batches SET n_jobs = n_jobs + ? WHERE id = ?',
                        (len(created), bid))
        return web.json_response({'job_ids': created})

    async def _close_batch(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        self._batch_row(bid)
        self.db.execute(
            "UPDATE batches SET state = 'running', time_closed = ? "
            "WHERE id = ? AND state = 'open'", (time.time(), bid))
        self._wake.set()
        return web.json_response({})

    def _batch_row(self, bid: int):
        rows = self.db.query('SELECT * FROM batches WHERE id = ?', (bid,))
        if not rows:
            raise web.HTTPNotFound(reason=f'batch {bid} not found')
        return rows[0]

    def _batch_status(self, bid: int) -> dict:
        b = self._batch_row(bid)
        counts = {s: 0 for s in
                  ('Pending', 'Ready', 'Running', 'Success', 'Failed',
                   'Cancelled', 'Error')}
        for r in self.db.query(
                'SELECT state, COUNT(*) c FROM jobs WHERE batch_id = ? '
                'GROUP BY state', (bid,)):
            counts[r['state']] = r['c']
        n_done = sum(counts[s] for s in TERMINAL)
        complete = b['state'] != 'open' and n_done == b['n_jobs']
        state = b['state']
        if complete and state == 'running':
            # all jobs terminal but the driver hasn't stamped the batch yet
            state = 'complete'
        return {
            'id': b['id'], 'state': state,
            'attributes': json.loads(b['attributes']),
            'billing_project': b['billing_project'],
            'n_jobs': b['n_jobs'], 'n_completed': n_done,
            'n_succeeded': counts['Success'],
            'n_failed': counts['Failed'] + counts['Error'],
            'n_cancelled': counts['Cancelled'],
            'complete': complete,
            'time_created': b['time_created'],
        }

    async def _get_batch(self, req: web.Request) -> web.Response:
        return web.json_response(self._batch_status(int(req.match_info['batch_id'])))

    def _job_json(self, r) -> dict:
        return {'batch_id': r['batch_id'], 'job_id': r['job_id'],
                'state': r['state'], 'exit_code': r['exit_code'],
                'attempts': r['attempts'], 'error': r['error'],
                'job_group_id': r['job_group_id'],
                'spec': json.loads(r['spec'])}

    async def _list_jobs(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        self._batch_row(bid)
        rows = self.db.query(
            'SELECT * FROM jobs WHERE batch_id = ? ORDER BY job_id', (bid,))
        return web.json_response({'jobs': [self._job_json(r) for r in rows]})

    async def _get_job(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        jid = int(req.match_info['job_id'])
        rows = self.db.query(
            'SELECT * FROM jobs WHERE batch_id = ? AND job_id = ?', (bid, jid))
        if not rows:
            raise web.HTTPNotFound(reason=f'job {bid}/{jid} not found')
        return web.json_response(self._job_json(rows[0]))

    async def _get_log(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        jid = int(req.match_info['job_id'])
        rows = self.db.query(
            'SELECT log_path FROM jobs WHERE batch_id = ? AND job_id = ?',
            (bid, jid))
        if not rows:
            raise web.HTTPNotFound(reason=f'job {bid}/{jid} not found')
        p = rows[0]['log_path']
        log = ''
        if p and os.path.exists(p):
            with open(p) as f:
                log = f.read()
        return web.json_response({'main': log})

    async def _cancel_batch(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        self._batch_row(bid)
        self._do_cancel(bid)
        self._wake.set()
        return web.json_response({})

    def _do_cancel(self, bid: int) -> None:
        self.db.execute(
            "UPDATE batches SET state = 'cancelled' WHERE id = ? "
            "AND state != 'complete'", (bid,))
        self.db.execute(
            "UPDATE jobs SET state = 'Cancelled' WHERE batch_id = ? "
            "AND state IN ('Pending', 'Ready') AND always_run = 0", (bid,))
        for (b, j), proc in list(self._running_procs.items()):
            if b == bid:
                try:
                    proc.terminate()
                except ProcessLookupError:
                    pass

    async def _delete_batch(self, req: web.Request) -> web.Response:
        bid = int(req.match_info['batch_id'])
        self._do_cancel(bid)
        self.db.execute('DELETE FROM jobs WHERE batch_id = ?', (bid,))
        self.db.execute('DELETE FROM batches WHERE id = ?', (bid,))
        return web.json_response({})

    # -- driver: scheduling + retries (reference driver/pool.py) ------------
    def _ready_jobs(self) -> List[sqlite3.Row]:
        """Pending jobs whose parents are all terminal-successful (or which
        are always_run with terminal parents)."""
        out = []
        for b in self.db.query(
                "SELECT id, cancel_after_n_failures, state FROM batches "
                "WHERE state IN ('running', 'cancelled')"):
            bid = b['id']
            jobs = self.db.query(
                'SELECT * FROM jobs WHERE batch_id = ? ORDER BY job_id', (bid,))
            states = {r['job_id']: r['state'] for r in jobs}
            cancelled = b['state'] == 'cancelled'
            for r in jobs:
                if r['state'] != 'Pending':
                    continue
                parents = json.loads(r['parents'])
                pstates = [states.get(p, 'Success') for p in parents]
                if cancelled and not r['always_run']:
                    self._set_job_state(bid, r['job_id'], 'Cancelled')
                    continue
                if any(s in ('Failed', 'Error', 'Cancelled') for s in pstates):
                    if r['always_run']:
                        if all(s in TERMINAL for s in pstates):
                            out.append(r)
                    else:
                        self._set_job_state(bid, r['job_id'], 'Cancelled')
                elif all(s == 'Success' for s in pstates):
                    out.append(r)
        return out

    def _set_job_state(self, bid, jid, state, **fields):
        sets = ['state = ?']
        args = [state]
        for k, v in fields.items():
            sets.append(f'{k} = ?')
            args.append(v)
        args += [bid, jid]
        self.db.execute(
            f'UPDATE jobs SET {", ".join(sets)} WHERE batch_id = ? AND job_id = ?',
            args)

    async def _driver_loop(self):
        loop = asyncio.get_running_loop()
        while not self._stopped:
            try:
                free = self.n_workers - len(self._running_procs)
                if free > 0:
                    ready = self._ready_jobs()
                    # fair share: grant slots to batches with fewest running
                    running_per_batch: Dict[int, int] = {}
                    for (b, _j) in self._running_procs:
                        running_per_batch[b] = running_per_batch.get(b, 0) + 1
                    ready.sort(key=lambda r: (running_per_batch.get(r['batch_id'], 0),
                                              r['batch_id'], r['job_id']))
                    for r in ready[:free]:
                        self._launch(r, loop)
                self._finalize_batches()
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=0.05)
                except asyncio.TimeoutError:
                    pass
                self._wake.clear()
            except Exception:  # noqa: BLE001 — driver must survive
                import traceback
                traceback.print_exc()
                await asyncio.sleep(0.2)

    def _launch(self, r: sqlite3.Row, loop) -> None:
        bid, jid = r['batch_id'], r['job_id']
        spec = json.loads(r['spec'])
        attempt = r['attempts'] + 1
        log_path = os.path.join(self.data_dir, 'logs', f'{bid}-{jid}-{attempt}.log')
        command = spec.get('command')
        if isinstance(command, list):
            argv = command
        else:
            argv = ['/bin/bash', '-c', command or 'true']
        env = dict(os.environ)
        env.update(spec.get('env') or {})
        logf = open(log_path, 'wb')
        # scoped worker isolation (reference worker: docker + cgroup limits;
        # here per-job rlimits — address space, cpu seconds, file size)
        resources = spec.get('resources') or {}

        def _limits():
            import resource as _res
            mem = resources.get('memory_bytes')
            if mem:
                _res.setrlimit(_res.RLIMIT_AS, (int(mem), int(mem)))
            cpu_s = resources.get('cpu_seconds')
            if cpu_s:
                _res.setrlimit(_res.RLIMIT_CPU, (int(cpu_s), int(cpu_s)))
            fsz = resources.get('max_file_bytes')
            if fsz:
                _res.setrlimit(_res.RLIMIT_FSIZE, (int(fsz), int(fsz)))

        proc = subprocess.Popen(argv, stdout=logf, stderr=subprocess.STDOUT,
                                env=env, start_new_session=True,
                                preexec_fn=_limits if resources else None)
        self._running_procs[(bid, jid)] = proc
        self._set_job_state(bid, jid, 'Running', attempts=attempt,
                            log_path=log_path, time_started=time.time())

        async def wait_done():
            rc = await loop.run_in_executor(None, proc.wait)
            logf.close()
            self._running_procs.pop((bid, jid), None)
            self._on_job_exit(bid, jid, rc, attempt)
            self._wake.set()
        asyncio.ensure_future(wait_done())

    def _on_job_exit(self, bid, jid, rc, attempt):
        row = self.db.query(
            'SELECT n_max_attempts, always_run FROM jobs '
            'WHERE batch_id = ? AND job_id = ?', (bid, jid))[0]
        if rc == 0:
            self._set_job_state(bid, jid, 'Success', exit_code=0,
                                time_completed=time.time())
            return
        bstate = self.db.query('SELECT state FROM batches WHERE id = ?',
                               (bid,))[0]['state']
        if bstate != 'cancelled':
            # cancelled job GROUP (or ancestor): same semantics as batch
            # cancellation, scoped to the subtree
            jg = self.db.query(
                'SELECT job_group_id FROM jobs WHERE batch_id = ? AND '
                'job_id = ?', (bid, jid))[0]['job_group_id']
            g = jg
            while g is not None:
                rows_g = self.db.query(
                    'SELECT state, parent_id FROM job_groups WHERE '
                    'batch_id = ? AND job_group_id = ?', (bid, g))
                if not rows_g:
                    break
                if rows_g[0]['state'] == 'cancelled':
                    bstate = 'cancelled'
                    break
                g = rows_g[0]['parent_id']
        if bstate == 'cancelled' and not row['always_run']:
            # terminated by batch/group cancellation, not a job failure
            self._set_job_state(bid, jid, 'Cancelled', exit_code=rc,
                                time_completed=time.time())
            return
        if attempt < row['n_max_attempts']:
            # retry: back to Pending (reference worker re-attempt semantics)
            self._set_job_state(bid, jid, 'Pending', exit_code=rc)
            return
        self._set_job_state(bid, jid, 'Failed', exit_code=rc,
                            time_completed=time.time())
        b = self.db.query(
            'SELECT cancel_after_n_failures FROM batches WHERE id = ?',
            (bid,))[0]
        canf = b['cancel_after_n_failures']
        if canf is not None:
            n_failed = self.db.query(
                "SELECT COUNT(*) c FROM jobs WHERE batch_id = ? AND "
                "state IN ('Failed', 'Error')", (bid,))[0]['c']
            if n_failed >= canf:
                self._do_cancel(bid)

    def _finalize_batches(self):
        for b in self.db.query(
                "SELECT id, n_jobs FROM batches WHERE state IN "
                "('running', 'cancelled')"):
            done = self.db.query(
                'SELECT COUNT(*) c FROM jobs WHERE batch_id = ? AND state IN '
                '(?, ?, ?, ?)', (b['id'],) + TERMINAL)[0]['c']
            if b['n_jobs'] > 0 and done == b['n_jobs']:
                self.db.execute(
                    "UPDATE batches SET state = 'complete', time_completed = ? "
                    "WHERE id = ?", (time.time(), b['id']))

    # -- lifecycle -----------------------------------------------------------
    async def start(self) -> int:
        self._runner = web.AppRunner(self._app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, '127.0.0.1', self.requested_port)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        self._driver_task = asyncio.ensure_future(self._driver_loop())
        return self.port

    async def stop(self):
        self._stopped = True
        for proc in list(self._running_procs.values()):
            try:
                proc.terminate()
            except ProcessLookupError:
                pass
        if self._driver_task:
            self._driver_task.cancel()
        if self._runner:
            await self._runner.cleanup()
        self.db.close()

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
