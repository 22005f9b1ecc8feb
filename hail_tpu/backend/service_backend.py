"""Shim of the reference's `hail.backend.service_backend` module: its test
harness imports `ServiceBackend` for isinstance dispatch
(`test/hail/conftest.py:12`). Query-on-Batch execution itself is superseded
by the in-process/multihost backends (SURVEY §7); this class exists so the
reference's own conftest/helpers import and run unmodified."""

from __future__ import annotations

from .backend import Backend


class ServiceBackend(Backend):
    """Never instantiated by hl.init here — present for isinstance checks."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'Query-on-Batch ServiceBackend is superseded by the local and '
            'multihost backends in this build; see hail_tpu.batch_service '
            'for the job service.')
