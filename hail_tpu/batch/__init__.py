"""`hail_tpu.batch` — pipeline DSL with dependency-ordered execution.

Capability parity with reference `hail/python/hailtop/batch/` (`Batch`,
`BashJob`/`PythonJob`, `Resource{File,Group}`, `LocalBackend`/
`ServiceBackend`, `batch.py`/`job.py`/`resource.py`/`backend.py:54,130,411`):
a DAG of containerless shell / python jobs with file-resource plumbing,
executed locally with a thread pool in dependency order. The multi-tenant
cloud service behind ServiceBackend (reference `batch/` L9) is gated in this
zero-egress build; the DSL, client API, and local execution engine are
complete.
"""

from .batch import Batch
from .job import BashJob, Job, PythonJob
from .resource import (InputResourceFile, JobResourceFile, PythonResult,
                       Resource, ResourceFile, ResourceGroup)
from .backend import Backend, LocalBackend, ServiceBackend
from .batch_pool_executor import BatchPoolExecutor

__all__ = ['Batch', 'Job', 'BashJob', 'PythonJob', 'Resource', 'ResourceFile',
           'InputResourceFile', 'JobResourceFile', 'ResourceGroup',
           'PythonResult', 'Backend', 'LocalBackend', 'ServiceBackend',
           'BatchPoolExecutor']
