"""BatchPoolExecutor: concurrent.futures over Batch python jobs (reference
`hailtop/batch/batch_pool_executor.py`)."""

from __future__ import annotations

import concurrent.futures
from typing import Callable, Iterable, List


class BatchPoolExecutor:
    def __init__(self, name=None, backend=None, max_workers: int = 8, **kwargs):
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=max_workers)

    def submit(self, fn: Callable, *args, **kwargs) -> concurrent.futures.Future:
        return self._pool.submit(fn, *args, **kwargs)

    def map(self, fn: Callable, *iterables: Iterable) -> List:
        return list(self._pool.map(fn, *iterables))

    def shutdown(self, wait: bool = True):
        self._pool.shutdown(wait=wait)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False
