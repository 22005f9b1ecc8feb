"""Single-node Batch job service (reference L9, zero-egress shape).

The reference runs a multi-tenant cloud service — aiohttp front_end
(`batch/batch/front_end/front_end.py:1569-2100`), MySQL state, an autoscaled
VM fleet with a fair-share scheduler (`driver/instance_collection/pool.py`),
and Docker-executing worker agents (`worker/worker.py:3018`). This package is
the same capability shape on one host: aiohttp REST front end with the
reference's /api/v1alpha routes, sqlite state, an asyncio driver with
fair-share scheduling across batches, and a subprocess worker pool with
per-attempt logs and retries.
"""

from .client import BatchServiceClient
from .service import BatchService

__all__ = ['BatchService', 'BatchServiceClient']
