"""Query-on-Batch ServiceBackend: execute query partitions as jobs of the
Batch service (reference `is/hail/backend/service/ServiceBackend.scala:196-300`
— each partition of a CDA becomes one Batch job; the driver stages the
serialized function + contexts, submits a batch, waits, and reads
per-partition results; failed partitions are retried by the service).

Single-node shape: the service is `hail_tpu.batch_service.BatchService`
(in-process by default, or a remote URL), jobs are subprocess workers
(`hail_tpu.backend.qob_worker`), and the staging area is a shared local
directory instead of a cloud bucket. The reference's `parallelism` window and
per-partition result reads map to one job + one result file per partition."""

from __future__ import annotations

import os
import sys
import tempfile
from typing import Any, Callable, List, Optional, Sequence

from .backend import Backend


class ServiceBackend(Backend):
    """Runs `map_collect` partitions as Batch jobs.

    Parameters
    ----------
    url:
        Batch service URL. If None, a private in-process BatchService is
        started (and stopped with the backend).
    n_workers:
        Worker slots for a private service (ignored with `url`).
    n_max_attempts:
        Per-partition attempt budget (reference QoB re-runs failed
        partitions; `ServiceBackend.scala` caps failures per stage).
    inline_threshold:
        Partition counts at or below this run inline on the driver — a
        subprocess round trip per tiny query would swamp the work (the
        reference similarly short-circuits empty/1-partition stages).
    """

    def __init__(self, url: Optional[str] = None, n_workers: int = 4,
                 n_max_attempts: int = 3, staging_dir: Optional[str] = None,
                 inline_threshold: int = 1, billing_project: str = 'local',
                 **_unused):
        from ..batch_service.client import BatchServiceClient
        self._own_service = None
        if url is None:
            from ..batch_service import BatchService
            self._own_service = BatchService.start_in_thread(n_workers=n_workers)
            url = f'http://127.0.0.1:{self._own_service.port}'
        self.url = url
        self.client = BatchServiceClient(url)
        self.n_max_attempts = n_max_attempts
        self.inline_threshold = inline_threshold
        self.billing_project = billing_project
        self._staging_root = staging_dir or tempfile.mkdtemp(prefix='hail_tpu_qob_')
        self._counter = 0

    def _map_collect_impl(self, contexts: Sequence[Any], fn: Callable[[Any], Any]) -> List[Any]:
        import cloudpickle
        contexts = list(contexts)
        if len(contexts) <= self.inline_threshold:
            return [fn(c) for c in contexts]

        self._counter += 1
        stage = os.path.join(self._staging_root, f'stage-{self._counter}')
        os.makedirs(stage, exist_ok=True)
        fn_path = os.path.join(stage, 'fn.pkl')
        with open(fn_path, 'wb') as f:
            cloudpickle.dump(fn, f)
        out_paths = []
        bunch = []
        for i, ctx in enumerate(contexts):
            ctx_path = os.path.join(stage, f'ctx-{i}.pkl')
            out_path = os.path.join(stage, f'out-{i}.pkl')
            with open(ctx_path, 'wb') as f:
                cloudpickle.dump(ctx, f)
            out_paths.append(out_path)
            bunch.append({
                'job_id': i + 1,
                'n_max_attempts': self.n_max_attempts,
                'process': {
                    'command': [sys.executable, '-m', 'hail_tpu.backend.qob_worker',
                                fn_path, ctx_path, out_path],
                    'env': {'JAX_PLATFORM_NAME': 'cpu'},
                },
            })

        bid = self.client.create_batch(
            attributes={'name': f'qob-stage-{self._counter}'},
            billing_project=self.billing_project)
        self.client.create_jobs(bid, bunch)
        self.client.close_batch(bid)
        status = self.client.wait(bid, timeout=600.0)
        if status['n_succeeded'] != len(contexts):
            # surface the first failed partition's log as the error message
            # (reference: HailBatchFailure with the worker's stack trace)
            for j in self.client.list_jobs(bid):
                if j['state'] in ('Failed', 'Error', 'Cancelled'):
                    log = self.client.get_job_log(bid, j['job_id'])
                    raise RuntimeError(
                        f'QoB stage failed: partition {j["job_id"] - 1} '
                        f'{j["state"]} after {j["attempts"]} attempt(s):\n{log[-4000:]}')
            raise RuntimeError(f'QoB stage failed: {status}')

        results = []
        for p in out_paths:
            with open(p, 'rb') as f:
                results.append(cloudpickle.load(f))
        return results

    def stop(self) -> None:
        if self._own_service is not None:
            self._own_service.shutdown()
            self._own_service = None
