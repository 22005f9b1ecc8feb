"""Blocking wrappers over aioclient (the reference
`hailtop.batch_client.client` surface): every call drives the async client
on a private event loop via async_to_blocking, and async iterators are
agen_to_blocking'd (reference client.py does exactly this shape)."""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

from . import aioclient
from ..utils.misc import async_to_blocking


def _agen_to_blocking(agen):
    while True:
        try:
            yield async_to_blocking(agen.__anext__())
        except StopAsyncIteration:
            return


class Job:
    _get_error = staticmethod(aioclient.Job._get_error)
    _get_out_of_memory = staticmethod(aioclient.Job._get_out_of_memory)
    _get_exit_code = staticmethod(aioclient.Job._get_exit_code)
    _get_exit_codes = staticmethod(aioclient.Job._get_exit_codes)
    exit_code = staticmethod(aioclient.Job.exit_code)
    total_duration_msecs = staticmethod(aioclient.Job.total_duration_msecs)

    def __init__(self, async_job: aioclient.Job):
        self._async_job = async_job

    @property
    def _status(self):
        return self._async_job._status

    @property
    def batch_id(self):
        return self._async_job.batch_id

    @property
    def job_id(self):
        return self._async_job.job_id

    @property
    def id(self):
        return self._async_job.id

    def attributes(self):
        return async_to_blocking(self._async_job.attributes())

    def is_complete(self):
        return async_to_blocking(self._async_job.is_complete())

    def is_running(self):
        return async_to_blocking(self._async_job.is_running())

    def is_pending(self):
        return async_to_blocking(self._async_job.is_pending())

    def is_ready(self):
        return async_to_blocking(self._async_job.is_ready())

    def status(self):
        return async_to_blocking(self._async_job.status())

    def wait(self):
        return async_to_blocking(self._async_job.wait())

    def _wait_for_states(self, *states: str):
        return async_to_blocking(self._async_job._wait_for_states(*states))

    def container_log(self, container_name):
        return async_to_blocking(
            self._async_job.container_log(container_name))

    def log(self):
        return async_to_blocking(self._async_job.log())

    def attempts(self):
        return async_to_blocking(self._async_job.attempts())

    def resource_usage(self):
        return async_to_blocking(self._async_job.resource_usage())


class JobGroup:
    def __init__(self, async_job_group: aioclient.JobGroup):
        self._async_job_group = async_job_group

    def attributes(self):
        return async_to_blocking(self._async_job_group.attributes())

    @property
    def batch_id(self) -> int:
        return self._async_job_group.batch_id

    @property
    def job_group_id(self) -> int:
        return self._async_job_group.job_group_id

    @property
    def id(self) -> Tuple[int, int]:
        return self._async_job_group.id

    def cancel(self):
        return async_to_blocking(self._async_job_group.cancel())

    def jobs(self, q: Optional[str] = None, version: Optional[int] = None,
             recursive: bool = False):
        return _agen_to_blocking(
            self._async_job_group.jobs(q, version, recursive))

    def job_groups(self) -> Iterator['JobGroup']:
        return (JobGroup(jg)
                for jg in _agen_to_blocking(
                    self._async_job_group.job_groups()))

    def status(self):
        return async_to_blocking(self._async_job_group.status())

    def wait(self, *args, **kwargs):
        return async_to_blocking(
            self._async_job_group.wait(*args, **kwargs))

    def last_known_status(self):
        return async_to_blocking(self._async_job_group.last_known_status())

    def create_job_group(self, *, attributes=None, callback=None,
                         cancel_after_n_failures=None) -> 'JobGroup':
        return JobGroup(self._async_job_group.create_job_group(
            attributes=attributes, callback=callback,
            cancel_after_n_failures=cancel_after_n_failures))

    def create_job(self, image: str, command: List[str], *,
                   parents: Optional[List[Job]] = None, **kwargs) -> Job:
        if parents:
            kwargs['parents'] = [p._async_job for p in parents]
        return Job(self._async_job_group.create_job(image, command, **kwargs))

    def create_jvm_job(self, command, *, profile: bool = False, parents=None,
                       **kwargs) -> Job:
        if parents:
            kwargs['parents'] = [p._async_job for p in parents]
        return Job(self._async_job_group.create_jvm_job(
            command, profile=profile, **kwargs))

    def debug_info(self):
        return async_to_blocking(self._async_job_group.debug_info())

    def __str__(self):
        import json
        return json.dumps(self.debug_info())


class Batch:
    @staticmethod
    def _open_batch(client: 'BatchClient',
                    token: Optional[str] = None) -> 'Batch':
        async_batch = client._async_client.create_batch(token=token)
        async_to_blocking(async_batch._open_batch())
        async_batch._root_job_group._submit(None)
        return Batch(async_batch)

    def __init__(self, async_batch: aioclient.Batch):
        self._async_batch = async_batch

    @property
    def is_created(self) -> bool:
        return self._async_batch.is_created

    @property
    def id(self) -> int:
        return self._async_batch.id

    @property
    def attributes(self):
        return self._async_batch.attributes

    @property
    def token(self):
        return self._async_batch.token

    @property
    def _submission_info(self):
        return self._async_batch._submission_info

    def get_job_group(self, job_group_id: int) -> JobGroup:
        return JobGroup(self._async_batch.get_job_group(job_group_id))

    def job_groups(self):
        return (JobGroup(jg)
                for jg in _agen_to_blocking(self._async_batch.job_groups()))

    def cancel(self):
        async_to_blocking(self._async_batch.cancel())

    def status(self):
        return async_to_blocking(self._async_batch.status())

    def last_known_status(self):
        return async_to_blocking(self._async_batch.last_known_status())

    def jobs(self, q=None, version=None):
        return _agen_to_blocking(self._async_batch.jobs(q, version))

    def get_job(self, job_id: int) -> Job:
        return Job(async_to_blocking(self._async_batch.get_job(job_id)))

    def get_job_log(self, job_id: int) -> Dict[str, Any]:
        return async_to_blocking(self._async_batch.get_job_log(job_id))

    def wait(self, *args, **kwargs):
        return async_to_blocking(self._async_batch.wait(*args, **kwargs))

    def debug_info(self):
        return async_to_blocking(self._async_batch.debug_info())

    def delete(self):
        async_to_blocking(self._async_batch.delete())

    def create_job_group(self, *, attributes=None, callback=None,
                         cancel_after_n_failures=None) -> JobGroup:
        return JobGroup(self._async_batch.create_job_group(
            attributes=attributes, callback=callback,
            cancel_after_n_failures=cancel_after_n_failures))

    def create_job(self, image: str, command: List[str], *,
                   parents: Optional[List[Job]] = None, **kwargs) -> Job:
        if parents:
            kwargs['parents'] = [p._async_job for p in parents]
        return Job(self._async_batch.create_job(image, command, **kwargs))

    def create_jvm_job(self, command, *, profile: bool = False, parents=None,
                       **kwargs) -> Job:
        if parents:
            kwargs['parents'] = [p._async_job for p in parents]
        return Job(self._async_batch.create_jvm_job(
            command, profile=profile, **kwargs))

    def submit(self, *args, **kwargs):
        async_to_blocking(self._async_batch.submit(*args, **kwargs))


class BatchClient:
    @staticmethod
    def from_async(async_client: aioclient.BatchClient):
        bc = BatchClient.__new__(BatchClient)
        bc._async_client = async_client
        return bc

    def __init__(self, billing_project: str, deploy_config=None,
                 session=None, headers=None, _token=None, token_file=None):
        self._async_client = async_to_blocking(aioclient.BatchClient.create(
            billing_project, deploy_config, session, headers, _token,
            token_file))

    @property
    def billing_project(self):
        return self._async_client.billing_project

    def reset_billing_project(self, billing_project):
        self._async_client.reset_billing_project(billing_project)

    def list_batches(self, q=None, last_batch_id=None, limit=2 ** 64,
                     version=None):
        return (Batch(b) for b in _agen_to_blocking(
            self._async_client.list_batches(q, last_batch_id, limit,
                                            version)))

    def get_job(self, batch_id, job_id):
        return Job(async_to_blocking(
            self._async_client.get_job(batch_id, job_id)))

    def get_job_log(self, batch_id, job_id):
        return async_to_blocking(
            self._async_client.get_job_log(batch_id, job_id))

    def get_job_attempts(self, batch_id, job_id):
        return async_to_blocking(
            self._async_client.get_job_attempts(batch_id, job_id))

    def get_batch(self, id):
        return Batch(async_to_blocking(self._async_client.get_batch(id)))

    def create_batch(self, attributes=None, callback=None, token=None,
                     cancel_after_n_failures=None) -> 'Batch':
        return Batch(self._async_client.create_batch(
            attributes=attributes, callback=callback, token=token,
            cancel_after_n_failures=cancel_after_n_failures))

    def get_billing_project(self, billing_project):
        return async_to_blocking(
            self._async_client.get_billing_project(billing_project))

    def list_billing_projects(self):
        return async_to_blocking(self._async_client.list_billing_projects())

    def create_billing_project(self, project):
        return async_to_blocking(
            self._async_client.create_billing_project(project))

    def add_user(self, user, project):
        return async_to_blocking(self._async_client.add_user(user, project))

    def remove_user(self, user, project):
        return async_to_blocking(
            self._async_client.remove_user(user, project))

    def close_billing_project(self, project):
        return async_to_blocking(
            self._async_client.close_billing_project(project))

    def reopen_billing_project(self, project):
        return async_to_blocking(
            self._async_client.reopen_billing_project(project))

    def delete_billing_project(self, project):
        return async_to_blocking(
            self._async_client.delete_billing_project(project))

    def edit_billing_limit(self, project, limit):
        return async_to_blocking(
            self._async_client.edit_billing_limit(project, limit))

    def supported_regions(self):
        return async_to_blocking(self._async_client.supported_regions())

    def default_region(self):
        return async_to_blocking(self._async_client.default_region())

    def cloud(self):
        return async_to_blocking(self._async_client.cloud())

    def close(self):
        async_to_blocking(self._async_client.close())
