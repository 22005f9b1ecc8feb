"""Batch driver: control loop with fair-share scheduling and a worker-pool
autoscaler.

Mirrors the reference driver's structure
(`/root/reference/batch/batch/driver/instance_collection/pool.py`):

  * **autoscaler** (`pool.py:236-487` control shape): each loop computes
    ready cores (here: ready jobs), targets
    `clamp(ready + running, min_workers, max_workers)` live executor slots,
    and resizes by at most `max_scale_per_loop` per iteration (the
    reference's per-loop instance-creation cap); idle slots above the
    target + a grace period scale back down.
  * **fair share** (`PoolScheduler._compute_fair_share`, `pool.py:493-605`):
    free slots are granted one at a time to the (user, batch) with the
    fewest currently-running jobs.
  * **canceller**: cancel_after_n_failures on batches and job groups,
    cancellation propagation to Ready/Running non-always-run jobs.
  * completion **callbacks**: POST the batch / job-group status JSON to the
    registered callback URL when it completes (reference front_end
    _handle_ui_error + driver callbacks).

Job state machine (reference): Pending -> Ready -> Running ->
Success | Failed | Cancelled | Error; retries re-enter Ready until
n_max_attempts.
"""

from __future__ import annotations

import asyncio
import json
import os
import re
import secrets
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Set, Tuple

from . import worker as worker_mod

TERMINAL = ('Success', 'Failed', 'Cancelled', 'Error')


def _now_ms() -> int:
    return int(time.time() * 1000)


class Autoscaler:
    """Slot-count controller with the reference pool's loop caps."""

    def __init__(self, min_workers: int, max_workers: int,
                 max_scale_per_loop: int = 4, idle_grace_s: float = 2.0):
        self.min_workers = min_workers
        self.max_workers = max_workers
        self.max_scale_per_loop = max_scale_per_loop
        self.idle_grace_s = idle_grace_s
        self.n_slots = min_workers
        self._idle_since: Optional[float] = None

    def step(self, n_ready: int, n_running: int) -> int:
        """One control-loop iteration; returns the new slot count."""
        demand = n_ready + n_running
        target = max(self.min_workers, min(self.max_workers, demand))
        if target > self.n_slots:
            self.n_slots = min(target,
                               self.n_slots + self.max_scale_per_loop)
            self._idle_since = None
        elif target < self.n_slots:
            now = time.monotonic()
            if self._idle_since is None:
                self._idle_since = now
            elif now - self._idle_since >= self.idle_grace_s:
                self.n_slots = max(target,
                                   self.n_slots - self.max_scale_per_loop)
                self._idle_since = now
        else:
            self._idle_since = None
        return self.n_slots


# -- image resolution --------------------------------------------------------
# The single-node worker executes host binaries; an image is a claim that
# the job's tools exist. Known images run; unknown ones fail like the
# reference worker's docker-pull failure (short_error 'image not found'),
# and syntactically invalid references fail like a bad `docker pull`.

_IMAGE_RE = re.compile(
    r'^(?:[a-zA-Z0-9.-]+(?::[0-9]+)?/)?'
    r'[a-z0-9]+(?:[._-]+[a-z0-9]+)*'
    r'(?:/[a-z0-9]+(?:[._-]+[a-z0-9]+)*)*'
    r'(?::[A-Za-z0-9_][A-Za-z0-9._-]{0,127})?'
    r'(?:@sha256:[A-Fa-f0-9]{64})?$')

_KNOWN_REPOS = {'ubuntu', 'python', 'debian', 'alpine', 'busybox', 'bash',
                'curlimages/curl', 'google/cloud-sdk'}


def _image_error(spec: dict):
    """None when the image can run here; else (short_error, message)."""
    process = spec.get('process') or {}
    if process.get('type') != 'docker':
        return None
    image = process.get('image')
    if not isinstance(image, str) or not image:
        return ('image cannot be parsed', 'no image specified')
    if not _IMAGE_RE.match(image):
        return ('image cannot be parsed',
                f'Invalid reference format: {image!r}')
    for k, v in os.environ.items():
        if k.endswith('_IMAGE') and v == image:
            return None
    name = image
    parts = name.split('/', 1)
    if len(parts) == 2 and ('.' in parts[0] or ':' in parts[0]):
        host, rest = parts
        if host in ('docker.io', 'registry.hub.docker.com', 'index.docker.io'):
            name = rest
        else:
            return ('image not found', f'image {image!r} not found')
    repo = name.split(':', 1)[0].split('@', 1)[0]
    if repo.startswith('library/'):
        repo = repo[len('library/'):]
    if repo in _KNOWN_REPOS or repo.startswith('hailgenetics/'):
        return None
    return ('image not found', f'image {image!r} not found')


class Driver:
    def __init__(self, db, data_dir: str, min_workers: int = 1,
                 n_workers: int = 4, max_workers: Optional[int] = None):
        self.db = db
        self.data_dir = data_dir
        self.autoscaler = Autoscaler(
            min_workers=min(min_workers, n_workers),
            max_workers=max_workers if max_workers is not None else n_workers)
        # executor threads are created up to max; the autoscaler's slot count
        # gates how many run concurrently (the "live instances")
        self._executor = ThreadPoolExecutor(
            max_workers=self.autoscaler.max_workers,
            thread_name_prefix='batch-worker')
        self.running: Dict[Tuple[int, int], dict] = {}   # (bid, jid) -> info
        self._wake = asyncio.Event()
        self._stopped = False
        self._task: Optional[asyncio.Task] = None
        self._notified_complete: Set[Tuple[str, int, int]] = set()

    # -- lifecycle ----------------------------------------------------------
    def start(self):
        self._task = asyncio.ensure_future(self.loop())

    async def stop(self):
        self._stopped = True
        for info in list(self.running.values()):
            info['cancelled'] = True
        if self._task:
            self._task.cancel()
        self._executor.shutdown(wait=False, cancel_futures=True)

    def wake(self):
        self._wake.set()

    # -- queries ------------------------------------------------------------
    def _cancelled_group_ids(self, bid: int) -> Set[int]:
        """Groups that are cancelled directly or via an ancestor."""
        rows = self.db.query(
            'SELECT job_group_id, parent_id, cancelled FROM job_groups '
            'WHERE batch_id = ?', (bid,))
        parent = {r['job_group_id']: r['parent_id'] for r in rows}
        direct = {r['job_group_id'] for r in rows if r['cancelled']}
        out = set()
        for g in parent:
            cur: Optional[int] = g
            while cur is not None:
                if cur in direct:
                    out.add(g)
                    break
                cur = parent.get(cur)
        return out

    def _refresh_states(self):
        """Promote Pending -> Ready / Cancelled per parent + cancel state
        (the reference's stored-procedure state transitions)."""
        for b in self.db.query(
                "SELECT id, cancelled FROM batches "
                "WHERE state IN ('running', 'cancelled')"):
            bid = b['id']
            jobs = self.db.query(
                'SELECT job_id, state, parents, always_run, job_group_id '
                'FROM jobs WHERE batch_id = ? AND committed = 1', (bid,))
            states = {r['job_id']: r['state'] for r in jobs}
            cancelled_groups = self._cancelled_group_ids(bid)
            batch_cancelled = bool(b['cancelled'])
            for r in jobs:
                if r['state'] not in ('Pending', 'Ready'):
                    continue
                jid = r['job_id']
                job_cancelled = (batch_cancelled
                                 or r['job_group_id'] in cancelled_groups)
                parents = json.loads(r['parents'])
                pstates = [states.get(p, 'Success') for p in parents]
                if job_cancelled and not r['always_run']:
                    self._set_job_state(bid, jid, 'Cancelled',
                                        time_completed=_now_ms())
                    continue
                if any(s in ('Failed', 'Error', 'Cancelled') for s in pstates):
                    # children transition only once ALL parents are terminal
                    # (reference semantics: j.wait() on a child implies every
                    # parent is already complete)
                    if not all(s in TERMINAL for s in pstates):
                        continue
                    if r['always_run']:
                        if r['state'] == 'Pending':
                            self._set_job_state(bid, jid, 'Ready')
                    else:
                        self._set_job_state(bid, jid, 'Cancelled',
                                            time_completed=_now_ms())
                elif all(s == 'Success' for s in pstates) \
                        and r['state'] == 'Pending':
                    self._set_job_state(bid, jid, 'Ready')

    def _set_job_state(self, bid, jid, state, **fields):
        sets = ['state = ?']
        args = [state]
        for k, v in fields.items():
            sets.append(f'{k} = ?')
            args.append(v)
        args += [bid, jid]
        self.db.execute(
            f'UPDATE jobs SET {", ".join(sets)} '
            f'WHERE batch_id = ? AND job_id = ?', args)

    # -- main loop ----------------------------------------------------------
    async def loop(self):
        loop = asyncio.get_running_loop()
        while not self._stopped:
            try:
                self._refresh_states()
                ready = self.db.query(
                    "SELECT jobs.*, batches.user AS user FROM jobs "
                    "JOIN batches ON batches.id = jobs.batch_id "
                    "WHERE jobs.state = 'Ready' ORDER BY jobs.batch_id, "
                    "jobs.job_id")
                n_slots = self.autoscaler.step(len(ready), len(self.running))
                free = n_slots - len(self.running)
                if free > 0 and ready:
                    # fair share: fewest-running (user, batch) first
                    per_key: Dict[Tuple[str, int], int] = {}
                    for info in self.running.values():
                        k = (info['user'], info['bid'])
                        per_key[k] = per_key.get(k, 0) + 1
                    grants = list(ready)
                    grants.sort(key=lambda r: (
                        per_key.get((r['user'], r['batch_id']), 0),
                        r['batch_id'], r['job_id']))
                    for r in grants[:free]:
                        self._launch(r, loop)
                self._finalize()
                await self._fire_callbacks()
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=0.05)
                except asyncio.TimeoutError:
                    pass
                self._wake.clear()
            except asyncio.CancelledError:
                return
            except Exception:   # noqa: BLE001 — the driver must survive
                import traceback
                traceback.print_exc()
                await asyncio.sleep(0.2)

    def _launch(self, r, loop):
        bid, jid = r['batch_id'], r['job_id']
        spec = json.loads(r['spec'])
        spec['batch_id'], spec['job_id'] = bid, jid
        image_err = _image_error(spec)
        if image_err is not None:
            # image never resolves: worker-level Error before any container
            # runs (reference worker pull failure -> short_error)
            short, msg = image_err
            t = _now_ms()
            status = json.dumps({'container_statuses': {
                'input': None,
                'main': {'name': 'main', 'state': 'error', 'error': msg,
                         'short_error': short,
                         'container_status': {'exit_code': None,
                                              'out_of_memory': False},
                         'timing': {'runtime': {'start_time': t,
                                                'finish_time': t,
                                                'duration': 0}}},
                'output': None},
                # job-level status error stays None: the client's
                # _get_exit_codes contract returns {'main': None} for a
                # container-level (image) error
                'error': None})
            self._set_job_state(bid, jid, 'Error', error=msg, status=status,
                                attempts=r['attempts'] + 1, time_started=t,
                                time_completed=t, duration_ms=0,
                                logs=json.dumps({}))
            self._wake.set()
            return
        attempt_no = r['attempts'] + 1
        attempt_id = secrets.token_hex(8)
        info = {'bid': bid, 'jid': jid, 'user': r['user'],
                'cancelled': False, 'attempt_id': attempt_id}
        self.running[(bid, jid)] = info
        t0 = _now_ms()
        self.db.execute(
            'INSERT INTO attempts (batch_id, job_id, attempt_id, start_time) '
            'VALUES (?, ?, ?, ?)', (bid, jid, attempt_id, t0))
        self._set_job_state(bid, jid, 'Running', attempts=attempt_no,
                            time_started=t0)
        io_dir = os.path.join(self.data_dir, 'io', f'{bid}-{jid}-{attempt_no}')
        log_dir = os.path.join(self.data_dir, 'logs',
                               f'{bid}-{jid}-{attempt_no}')

        def cancel_check():
            return info['cancelled'] or self._stopped

        async def run():
            try:
                res = await loop.run_in_executor(
                    self._executor, worker_mod.run_job_attempt, spec, io_dir,
                    log_dir, cancel_check)
            except Exception as e:   # noqa: BLE001
                res = worker_mod.JobResult()
                res.error = f'worker error: {e!r}'
            self.running.pop((bid, jid), None)
            self._on_attempt_done(bid, jid, attempt_no, attempt_id, info, res)
            self._wake.set()
        asyncio.ensure_future(run())

    def _on_attempt_done(self, bid, jid, attempt_no, attempt_id, info, res):
        t1 = _now_ms()
        self.db.execute(
            'UPDATE attempts SET end_time = ?, reason = ? '
            'WHERE batch_id = ? AND job_id = ? AND attempt_id = ?',
            (t1, 'completed' if res.ok else 'error', bid, jid, attempt_id))
        status_json = json.dumps({
            'container_statuses': res.container_statuses,
            'error': res.error,
        })
        logs_json = json.dumps(res.logs)
        row = self.db.query(
            'SELECT n_max_attempts, always_run, job_group_id, spec FROM jobs '
            'WHERE batch_id = ? AND job_id = ?', (bid, jid))
        if not row:
            return                     # batch deleted under us
        row = row[0]
        was_cancelled = info['cancelled'] or self._job_is_cancelled(
            bid, jid, row)
        common = dict(status=status_json, logs=logs_json,
                      time_completed=t1, duration_ms=res.duration_ms)
        if was_cancelled and not row['always_run']:
            self._set_job_state(bid, jid, 'Cancelled',
                                exit_code=res.exit_code, **common)
            return
        if res.timed_out:
            # reference JobTimeoutError: worker-level error -> state Error,
            # never retried (test_timeout expects Error after one attempt)
            self._set_job_state(bid, jid, 'Error', exit_code=res.exit_code,
                                error=res.error, **common)
        elif res.error is not None:
            # internal/worker error: bounded retries (reference preemption
            # semantics), then Error
            if attempt_no < min(row['n_max_attempts'], 3):
                self._set_job_state(bid, jid, 'Ready',
                                    exit_code=res.exit_code,
                                    status=status_json, logs=logs_json)
                return
            self._set_job_state(bid, jid, 'Error', exit_code=res.exit_code,
                                error=res.error, **common)
        elif res.ok:
            self._set_job_state(bid, jid, 'Success', exit_code=0, **common)
            return
        else:
            # user-level nonzero exit: Failed immediately (reference
            # mark_job_complete semantics) — UNLESS the client explicitly
            # requested retries via n_max_attempts (internal QoB workers
            # re-run crashed partitions this way)
            explicit_retries = 'n_max_attempts' in json.loads(row['spec'])
            if explicit_retries and attempt_no < row['n_max_attempts']:
                self._set_job_state(bid, jid, 'Ready',
                                    exit_code=res.exit_code,
                                    status=status_json, logs=logs_json)
                return
            self._set_job_state(bid, jid, 'Failed', exit_code=res.exit_code,
                                error=res.error, **common)
        self._maybe_cancel_after_failures(bid, row['job_group_id'])

    def _job_is_cancelled(self, bid, jid, row) -> bool:
        b = self.db.query('SELECT cancelled FROM batches WHERE id = ?',
                          (bid,))
        if b and b[0]['cancelled']:
            return True
        return row['job_group_id'] in self._cancelled_group_ids(bid)

    def _maybe_cancel_after_failures(self, bid: int, gid: int):
        b = self.db.query(
            'SELECT cancel_after_n_failures FROM batches WHERE id = ?',
            (bid,))
        if b and b[0]['cancel_after_n_failures'] is not None:
            n_failed = self.db.query(
                "SELECT COUNT(*) c FROM jobs WHERE batch_id = ? AND "
                "state IN ('Failed', 'Error')", (bid,))[0]['c']
            if n_failed >= b[0]['cancel_after_n_failures']:
                self.cancel_batch(bid)
        # job-group-level cancel_after_n_failures, up the ancestor chain
        g: Optional[int] = gid
        while g is not None:
            rows = self.db.query(
                'SELECT parent_id, cancel_after_n_failures FROM job_groups '
                'WHERE batch_id = ? AND job_group_id = ?', (bid, g))
            if not rows:
                break
            canf = rows[0]['cancel_after_n_failures']
            if canf is not None:
                gids = self._descendants(bid, g)
                qmarks = ','.join('?' * len(gids))
                n_failed = self.db.query(
                    f"SELECT COUNT(*) c FROM jobs WHERE batch_id = ? AND "
                    f"job_group_id IN ({qmarks}) AND "
                    f"state IN ('Failed', 'Error')", (bid, *gids))[0]['c']
                if n_failed >= canf:
                    self.cancel_job_group(bid, g)
            g = rows[0]['parent_id']

    def _descendants(self, bid: int, gid: int):
        children: Dict[Optional[int], list] = {}
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

    # -- cancellation -------------------------------------------------------
    def cancel_batch(self, bid: int):
        self.db.execute(
            "UPDATE batches SET cancelled = 1, state = 'cancelled' "
            "WHERE id = ? AND state != 'complete'", (bid,))
        self.db.execute(
            "UPDATE jobs SET state = 'Cancelled', time_completed = ? "
            "WHERE batch_id = ? AND state IN ('Pending', 'Ready') "
            "AND always_run = 0", (_now_ms(), bid))
        for (b, _j), info in list(self.running.items()):
            if b == bid:
                info['cancelled'] = True
        self.wake()

    def cancel_job_group(self, bid: int, gid: int):
        gids = self._descendants(bid, gid)
        qmarks = ','.join('?' * len(gids))
        self.db.execute(
            f'UPDATE job_groups SET cancelled = 1 WHERE batch_id = ? AND '
            f'job_group_id IN ({qmarks})', (bid, *gids))
        if gid == 0:
            return self.cancel_batch(bid)
        self.db.execute(
            f"UPDATE jobs SET state = 'Cancelled', time_completed = ? "
            f"WHERE batch_id = ? AND job_group_id IN ({qmarks}) AND "
            f"state IN ('Pending', 'Ready') AND always_run = 0",
            (_now_ms(), bid, *gids))
        in_group = {r['job_id'] for r in self.db.query(
            f'SELECT job_id FROM jobs WHERE batch_id = ? AND job_group_id '
            f'IN ({qmarks})', (bid, *gids))}
        for (b, j), info in list(self.running.items()):
            if b == bid and j in in_group:
                info['cancelled'] = True
        self.wake()

    # -- completion ---------------------------------------------------------
    def _finalize(self):
        for b in self.db.query(
                "SELECT id, n_jobs FROM batches WHERE state IN "
                "('running', 'cancelled')"):
            done = self.db.query(
                'SELECT COUNT(*) c FROM jobs WHERE batch_id = ? AND '
                'committed = 1 AND state IN (?, ?, ?, ?)',
                (b['id'],) + TERMINAL)[0]['c']
            if b['n_jobs'] > 0 and done == b['n_jobs']:
                self.db.execute(
                    "UPDATE batches SET state = 'complete', "
                    "time_completed = ? WHERE id = ? AND state != 'complete'",
                    (_now_ms(), b['id']))
        # job group completion stamps
        for g in self.db.query(
                'SELECT batch_id, job_group_id FROM job_groups WHERE '
                'time_completed IS NULL'):
            bid, gid = g['batch_id'], g['job_group_id']
            bstate = self.db.query('SELECT state FROM batches WHERE id = ?',
                                   (bid,))
            if not bstate or bstate[0]['state'] == 'open':
                continue
            gids = self._descendants(bid, gid)
            qmarks = ','.join('?' * len(gids))
            rows = self.db.query(
                f'SELECT COUNT(*) n, SUM(CASE WHEN state IN (?, ?, ?, ?) '
                f'THEN 1 ELSE 0 END) done FROM jobs WHERE batch_id = ? AND '
                f'committed = 1 AND job_group_id IN ({qmarks})',
                TERMINAL + (bid, *gids))
            n, done = rows[0]['n'], rows[0]['done'] or 0
            if n > 0 and done == n:
                self.db.execute(
                    'UPDATE job_groups SET time_completed = ? WHERE '
                    'batch_id = ? AND job_group_id = ?', (_now_ms(), bid, gid))

    async def _fire_callbacks(self):
        """POST batch / job-group status to registered callbacks once."""
        from .front_end import batch_status_dict, job_group_status_dict
        for b in self.db.query(
                "SELECT id, callback FROM batches WHERE state IN "
                "('complete', 'cancelled') AND callback IS NOT NULL"):
            key = ('batch', b['id'], 0)
            if key in self._notified_complete:
                continue
            st = batch_status_dict(self.db, b['id'])
            if not st['complete']:
                continue
            self._notified_complete.add(key)
            asyncio.ensure_future(self._post_callback(b['callback'], st))
        for g in self.db.query(
                'SELECT batch_id, job_group_id, callback FROM job_groups '
                'WHERE callback IS NOT NULL AND time_completed IS NOT NULL'):
            key = ('group', g['batch_id'], g['job_group_id'])
            if key in self._notified_complete:
                continue
            self._notified_complete.add(key)
            st = job_group_status_dict(self.db, g['batch_id'],
                                       g['job_group_id'])
            asyncio.ensure_future(self._post_callback(g['callback'], st))

    @staticmethod
    async def _post_callback(url: str, payload: dict):
        import aiohttp
        try:
            async with aiohttp.ClientSession() as s:
                async with s.post(url, json=payload,
                                  timeout=aiohttp.ClientTimeout(total=30)):
                    pass
        except Exception:   # noqa: BLE001 — callbacks are best-effort
            pass
