"""Execution backends.

The single distributed primitive is `map_collect(contexts)(partition_fn)` —
the analogue of the reference's
`DriverRuntimeContext.mapCollectPartitions(globals, contexts)(f)`
(`is/hail/backend/Backend.scala:54-67`). The local backend maps partitions
over a thread pool (numpy/jax release the GIL in kernels); the multihost
backend (hail_tpu/backend/distributed.py) shards contexts across
`jax.process_index()` and merges with collectives.
"""

from __future__ import annotations

import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, List, Optional, Sequence


def _retrying(fn: Callable[[Any], Any], stage_id: int) -> Callable[[Any], Any]:
    """Per-partition retry (Spark's task-retry analogue, reference
    ServiceBackend.scala:290-300 partition re-runs): each partition gets up to
    `max_partition_attempts` tries; retries are logged to the session log."""
    from ..context import Env
    attempts = 3
    if Env.is_initialized():
        try:
            attempts = max(1, int(Env.hc().flags.get('max_partition_attempts', '3')))
        except (TypeError, ValueError):
            pass
    if attempts <= 1:
        return fn

    def run(ctx):
        for attempt in range(1, attempts + 1):
            try:
                return fn(ctx)
            except Exception as e:
                if attempt == attempts:
                    raise
                from ..utils.hail_logging import logger
                logger().warning(
                    'stage %d: partition attempt %d/%d failed (%s: %s); retrying',
                    stage_id, attempt, attempts, type(e).__name__, e)
        raise AssertionError('unreachable')

    return run


class Backend:
    """Template: `map_collect` times every stage and writes a per-stage record
    to the session log (the analogue of the reference's per-stage Spark log
    lines and QoB X-Hail-Timings), then delegates to the subclass's
    `_map_collect_impl`."""

    _stage_counter = 0

    @property
    def fs(self):
        """Backend filesystem (reference Backend.fs): the scheme-routing FS."""
        from ..fs.router_fs import get_fs
        return get_fs()

    def map_collect(self, contexts: Sequence[Any], fn: Callable[[Any], Any]) -> List[Any]:
        contexts = list(contexts)
        Backend._stage_counter += 1
        stage_id = Backend._stage_counter
        t0 = time.perf_counter()
        try:
            results = self._map_collect_impl(contexts, _retrying(fn, stage_id))
            return results
        finally:
            from ..utils.hail_logging import logger
            logger().info(
                'stage %d (%s): %d partition(s) in %.3fs',
                stage_id, type(self).__name__, len(contexts),
                time.perf_counter() - t0)

    def _map_collect_impl(self, contexts: Sequence[Any], fn: Callable[[Any], Any]) -> List[Any]:
        raise NotImplementedError

    def stop(self) -> None:
        pass


class LocalBackend(Backend):
    # the engine always executes through the lowered (stage) pipeline
    requires_lowering = False

    """Thread-pool partition execution on one host
    (reference `backend/local/LocalBackend.scala`)."""

    def __init__(self, n_threads: Optional[int] = None):
        if n_threads is None:
            n_threads = min(os.cpu_count() or 4, 16)
        self.n_threads = n_threads
        self._pool: Optional[ThreadPoolExecutor] = None

    @property
    def pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.n_threads)
        return self._pool

    _in_worker = threading.local()

    def _map_collect_impl(self, contexts, fn):
        if len(contexts) <= 1 or getattr(LocalBackend._in_worker, 'flag', False):
            # nested stages (a partition fn that itself collects, e.g. a
            # lookup-join building its dictionary) run serially in-thread:
            # scheduling them on the same pool can deadlock when every
            # worker is blocked waiting on queued subtasks
            return [fn(c) for c in contexts]

        def run(c):
            LocalBackend._in_worker.flag = True
            try:
                return fn(c)
            finally:
                LocalBackend._in_worker.flag = False
        return list(self.pool.map(run, contexts))

    def stop(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
