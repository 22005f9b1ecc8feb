"""Async Batch client with the reference `hailtop.batch_client.aioclient`
API surface (classes, methods, spec shapes), speaking to the in-repo Batch
service (batch_service/front_end.py).

This is a fresh implementation of the same contract the reference client
exposes (reference hail/python/hailtop/batch_client/aioclient.py): Job /
JobGroup / Batch / BatchClient with client-relative job ids per update,
bunched submission, token-idempotent creation, transient-error retries
(which the reference's FailureInjectingClientSession tests exercise), and
the container-status accessors (`_get_exit_code(status, 'main')` etc).
"""

from __future__ import annotations

import asyncio
import json
import os
import random
import secrets
from enum import Enum
from typing import Any, AsyncIterator, Dict, List, Optional, Tuple, cast

import aiohttp

from ..services import httpx_client as httpx

ROOT_JOB_GROUP_ID = 0
MAX_JOB_GROUPS_DEPTH = 2
tasks = ('input', 'main', 'output')
complete_states = ('Cancelled', 'Error', 'Failed', 'Success')

_TRANSIENT_STATUSES = (408, 429, 500, 502, 503, 504)


async def _sleep_before_try(tries: int):
    await asyncio.sleep(min(0.05 * (2 ** min(tries, 6)),
                            1.0) * (0.5 + random.random()))


class JobAlreadySubmittedError(Exception):
    pass


class JobNotSubmittedError(Exception):
    pass


class JobGroupAlreadySubmittedError(Exception):
    pass


class JobGroupNotSubmittedError(Exception):
    pass


class BatchNotCreatedError(Exception):
    pass


class BatchAlreadyCreatedError(Exception):
    pass


class BatchNotAuthenticatedError(Exception):
    def __init__(self):
        super().__init__(
            'Not authenticated with Hail Batch.\n\nPlease run:\n\n'
            '    hailctl auth login\n\nto obtain credentials.')


class SpecType(Enum):
    JOB = 'job'
    JOB_GROUP = 'job_group'


class SpecBytes:
    def __init__(self, spec_bytes: bytes, typ: SpecType):
        self.spec_bytes = spec_bytes
        self.typ = typ

    @property
    def n_bytes(self) -> int:
        return len(self.spec_bytes)


class BatchSubmissionInfo:
    def __init__(self, used_fast_path: Optional[bool] = None):
        self.used_fast_path = used_fast_path


class Job:
    @staticmethod
    def _get_error(job_status, task):
        status = job_status.get('status')
        if not status:
            return None
        cstatuses = status.get('container_statuses')
        if not cstatuses:
            return None
        cstatus = cstatuses.get(task)
        if not cstatus:
            return None
        return cstatus.get('error')

    @staticmethod
    def _get_out_of_memory(job_status, task):
        status = job_status.get('status')
        if not status:
            return None
        cstatuses = status.get('container_statuses')
        if not cstatuses:
            return None
        tstatus = cstatuses.get(task)
        if not tstatus:
            return None
        cstatus = tstatus.get('container_status')
        if not cstatus:
            return None
        return cstatus['out_of_memory']

    @staticmethod
    def _get_container_status_exit_code(container_status):
        if container_status.get('error') is not None:
            return None
        docker_status = container_status.get('container_status')
        if not docker_status:
            return None
        return docker_status.get('exit_code')

    @staticmethod
    def _get_exit_code(job_status, task):
        status = job_status.get('status')
        if not status:
            return None
        cstatuses = status.get('container_statuses')
        if not cstatuses:
            return None
        cstatus = cstatuses.get(task)
        if not cstatus:
            return None
        return Job._get_container_status_exit_code(cstatus)

    @staticmethod
    def _get_exit_codes(job_status):
        status = job_status.get('status')
        if not status:
            return None
        if status.get('error') is not None:
            return None
        cstatuses = status.get('container_statuses')
        if not cstatuses:
            return None
        return {task: Job._get_container_status_exit_code(cstatus)
                for task, cstatus in cstatuses.items()
                if cstatus is not None}

    @staticmethod
    def exit_code(job_status):
        exit_codes = Job._get_exit_codes(job_status)
        if exit_codes is None:
            return None
        codes = [exit_codes[task] for task in tasks if task in exit_codes]
        for ec in codes:
            if ec is None:
                return None
            if ec > 0:
                return ec
        return 0

    @staticmethod
    def total_duration_msecs(job_status):
        status = job_status.get('status')
        if not status:
            return None
        cstatuses = status.get('container_statuses')
        if not cstatuses:
            return None

        def dur(cstatus):
            if not cstatus:
                return None
            timing = cstatus.get('timing')
            if not timing:
                return None
            runtime = timing.get('runtime')
            if not runtime:
                return None
            return runtime.get('duration')

        durations = [dur(c) for c in cstatuses.values()]
        if any(d is None for d in durations):
            return None
        return sum(durations)

    @staticmethod
    def submitted_job(batch: 'Batch', job_id: int,
                      _status: Optional[dict] = None):
        return Job(batch, job_id, submitted=True, _status=_status)

    @staticmethod
    def unsubmitted_job(batch: 'Batch', job_id: int):
        return Job(batch, job_id, submitted=False)

    def __init__(self, batch: 'Batch', job_id: int, submitted: bool, *,
                 _status: Optional[dict] = None):
        self._batch = batch
        self._job_id = job_id
        self._submitted = submitted
        self._status = _status

    def _raise_if_not_submitted(self):
        if not self.is_submitted:
            raise JobNotSubmittedError

    def _raise_if_submitted(self):
        if self.is_submitted:
            raise JobAlreadySubmittedError

    def _submit(self, in_update_start_job_id: int):
        self._raise_if_submitted()
        self._job_id = in_update_start_job_id + self._job_id - 1
        self._submitted = True

    @property
    def is_submitted(self):
        return self._submitted

    @property
    def batch_id(self) -> int:
        return self._batch.id

    @property
    def job_id(self) -> int:
        self._raise_if_not_submitted()
        return self._job_id

    @property
    def id(self) -> Tuple[int, int]:
        self._raise_if_not_submitted()
        return (self.batch_id, self.job_id)

    @property
    def _client(self) -> 'BatchClient':
        return self._batch._client

    async def attributes(self):
        if not self._status:
            await self.status()
        assert self._status is not None
        return self._status.get('attributes', {})

    async def _is_job_in_state(self, states):
        await self.status()
        assert self._status is not None
        return self._status['state'] in states

    async def is_complete(self):
        return await self._is_job_in_state(complete_states)

    async def is_running(self):
        return await self._is_job_in_state(['Running'])

    async def is_pending(self):
        return await self._is_job_in_state(['Pending'])

    async def is_ready(self):
        return await self._is_job_in_state(['Ready'])

    async def status(self) -> Dict[str, Any]:
        self._raise_if_not_submitted()
        resp = await self._client._get(
            f'/api/v1alpha/batches/{self.batch_id}/jobs/{self.job_id}')
        self._status = await resp.json()
        assert self._status is not None
        return self._status

    async def wait(self) -> Dict[str, Any]:
        return cast(Dict[str, Any],
                    await self._wait_for_states(*complete_states))

    async def _wait_for_states(self, *states: str):
        tries = 0
        while True:
            if await self._is_job_in_state(states) or await self.is_complete():
                assert self._status
                return self._status
            tries += 1
            await _sleep_before_try(tries)

    async def container_log(self, container_name: str) -> bytes:
        self._raise_if_not_submitted()
        async with await self._client._get(
                f'/api/v1alpha/batches/{self.batch_id}/jobs/{self.job_id}'
                f'/log/{container_name}') as resp:
            return await resp.read()

    async def log(self):
        self._raise_if_not_submitted()
        resp = await self._client._get(
            f'/api/v1alpha/batches/{self.batch_id}/jobs/{self.job_id}/log')
        return await resp.json()

    async def attempts(self):
        self._raise_if_not_submitted()
        resp = await self._client._get(
            f'/api/v1alpha/batches/{self.batch_id}/jobs/{self.job_id}'
            '/attempts')
        return await resp.json()

    async def resource_usage(self):
        self._raise_if_not_submitted()
        resp = await self._client._get(
            f'/api/v1alpha/batches/{self.batch_id}/jobs/{self.job_id}'
            '/resource_usage')
        return await resp.json()


class JobGroup:
    @staticmethod
    def submitted_job_group(batch: 'Batch', job_group_id: int, *,
                            _last_known_status=None) -> 'JobGroup':
        return JobGroup(batch, job_group_id, submitted=True,
                        last_known_status=_last_known_status)

    @staticmethod
    def unsubmitted_job_group(batch: 'Batch', job_group_id: int) -> 'JobGroup':
        return JobGroup(batch, job_group_id, submitted=False)

    def __init__(self, batch: 'Batch', job_group_id: int, submitted: bool, *,
                 last_known_status=None):
        self._batch = batch
        self._job_group_id = job_group_id
        self._submitted = submitted
        self._last_known_status = last_known_status

    def _submit(self, in_update_start_job_group_id: Optional[int]):
        self._raise_if_submitted()
        if in_update_start_job_group_id is None:
            assert self._job_group_id == ROOT_JOB_GROUP_ID
        else:
            self._job_group_id = (in_update_start_job_group_id
                                  + self._job_group_id - 1)
        self._submitted = True

    def _raise_if_not_submitted(self):
        if not self.is_submitted:
            raise JobGroupNotSubmittedError

    def _raise_if_submitted(self):
        if self.is_submitted:
            raise JobGroupAlreadySubmittedError

    async def attributes(self) -> Dict[str, str]:
        self._raise_if_not_submitted()
        status = await self.last_known_status()
        return status.get('attributes', {})

    @property
    def is_submitted(self) -> bool:
        return self._submitted

    @property
    def batch_id(self) -> int:
        return self._batch.id

    @property
    def job_group_id(self) -> int:
        self._raise_if_not_submitted()
        return self._job_group_id

    @property
    def id(self) -> Tuple[int, int]:
        self._raise_if_not_submitted()
        return (self.batch_id, self.job_group_id)

    @property
    def _client(self) -> 'BatchClient':
        return self._batch._client

    async def cancel(self):
        self._raise_if_not_submitted()
        await self._client._patch(
            f'/api/v1alpha/batches/{self.batch_id}/job-groups/'
            f'{self.job_group_id}/cancel')

    async def job_groups(self) -> AsyncIterator['JobGroup']:
        self._raise_if_not_submitted()
        last_id = None
        while True:
            params: Dict[str, Any] = {}
            if last_id is not None:
                params['last_job_group_id'] = last_id
            resp = await self._client._get(
                f'/api/v1alpha/batches/{self.batch_id}/job-groups/'
                f'{self.job_group_id}/job-groups', params=params)
            body = await resp.json()
            for jg in body['job_groups']:
                yield JobGroup.submitted_job_group(
                    self._batch, jg['job_group_id'], _last_known_status=jg)
            last_id = body.get('last_job_group_id')
            if last_id is None:
                break

    async def jobs(self, q: Optional[str] = None,
                   version: Optional[int] = None,
                   recursive: bool = False):
        self._raise_if_not_submitted()
        if version is None:
            version = 1
        last_job_id = None
        while True:
            params: Dict[str, Any] = {'recursive': str(recursive)}
            if q is not None:
                params['q'] = q
            if last_job_id is not None:
                params['last_job_id'] = last_job_id
            resp = await self._client._get(
                f'/api/v{version}alpha/batches/{self.batch_id}/job-groups/'
                f'{self.job_group_id}/jobs', params=params)
            body = await resp.json()
            for job in body['jobs']:
                yield job
            last_job_id = body.get('last_job_id')
            if last_job_id is None:
                break

    async def status(self):
        self._raise_if_not_submitted()
        resp = await self._client._get(
            f'/api/v1alpha/batches/{self.batch_id}/job-groups/'
            f'{self.job_group_id}')
        self._last_known_status = await resp.json()
        return self._last_known_status

    async def last_known_status(self):
        self._raise_if_not_submitted()
        if self._last_known_status is None:
            return await self.status()
        return self._last_known_status

    def create_job(self, image: str, command: List[str], **kwargs) -> Job:
        return self._batch._create_job(
            self, {'command': command, 'image': image, 'type': 'docker'},
            **kwargs)

    def create_jvm_job(self, jar_spec: Dict[str, str], argv: List[str], *,
                       profile: bool = False, **kwargs):
        return self._batch._create_job(
            self, {'type': 'jvm', 'jar_spec': jar_spec, 'command': argv,
                   'profile': profile}, **kwargs)

    def create_job_group(self, *, attributes=None, callback=None,
                         cancel_after_n_failures=None) -> 'JobGroup':
        return self._batch._create_job_group(
            self, attributes=attributes, callback=callback,
            cancel_after_n_failures=cancel_after_n_failures)

    async def wait(self, *, disable_progress_bar: bool = True,
                   description: str = '', progress=None):
        self._raise_if_not_submitted()
        i = 0
        while True:
            status = await self.status()
            if status['complete']:
                return status
            j = random.randrange(max(1, int(1.1 ** i)))
            await asyncio.sleep(0.100 * j)
            if i < 64:
                i += 1

    async def debug_info(self, _jobs_query_string=None, _max_job_groups=None,
                         _max_jobs=None):
        self._raise_if_not_submitted()
        jg_status = await self.status()
        job_groups = []
        jobs = []
        async for jg in self.job_groups():
            if _max_job_groups and _max_job_groups == len(job_groups):
                break
            job_groups.append({'status': jg._last_known_status})
        async for j_status in self.jobs(q=_jobs_query_string):
            if _max_jobs and len(jobs) == _max_jobs:
                break
            jid = j_status['job_id']
            log, job = await asyncio.gather(self._batch.get_job_log(jid),
                                            self._batch.get_job(jid))
            jobs.append({'log': log, 'status': job._status})
        return {'status': jg_status, 'job_groups': job_groups, 'jobs': jobs}

    def __str__(self):
        from ..utils.misc import async_to_blocking
        return json.dumps(async_to_blocking(self.debug_info()))


class Batch:
    def __init__(self, client: 'BatchClient', id: Optional[int], *,
                 attributes: Optional[Dict[str, str]] = None,
                 callback: Optional[str] = None,
                 token: Optional[str] = None,
                 cancel_after_n_failures: Optional[int] = None,
                 last_known_status: Optional[Dict[str, Any]] = None):
        self._client = client
        self._id = id
        self.attributes: Dict[str, str] = attributes or {}
        self._callback = callback
        if token is None:
            token = secrets.token_urlsafe(32)
        self.token = token
        self._cancel_after_n_failures = cancel_after_n_failures
        self._submission_info = BatchSubmissionInfo()
        self._last_known_status = last_known_status

        self._in_update_job_group_id = 0
        self._job_group_specs: List[Dict[str, Any]] = []
        self._job_groups: List[JobGroup] = []
        self._in_update_job_id = 0
        self._job_specs: List[Dict[str, Any]] = []
        self._jobs: List[Job] = []

        if self._id is not None:
            self._root_job_group = JobGroup.submitted_job_group(
                self, ROOT_JOB_GROUP_ID)
        else:
            self._root_job_group = JobGroup.unsubmitted_job_group(
                self, ROOT_JOB_GROUP_ID)

    def _raise_if_not_created(self):
        if not self.is_created:
            raise BatchNotCreatedError

    def _raise_if_created(self):
        if self.is_created:
            raise BatchAlreadyCreatedError

    @property
    def id(self) -> int:
        self._raise_if_not_created()
        assert self._id
        return self._id

    @property
    def is_created(self):
        return self._id is not None

    def get_job_group(self, job_group_id: int) -> JobGroup:
        self._raise_if_not_created()
        return JobGroup.submitted_job_group(self, job_group_id)

    async def cancel(self):
        self._raise_if_not_created()
        await self._root_job_group.cancel()

    def jobs(self, q: Optional[str] = None, version: Optional[int] = None):
        self._raise_if_not_created()
        return self._root_job_group.jobs(q, version, recursive=True)

    def job_groups(self):
        self._raise_if_not_created()
        return self._root_job_group.job_groups()

    async def get_job(self, job_id: int) -> Job:
        self._raise_if_not_created()
        return await self._client.get_job(self.id, job_id)

    async def get_job_log(self, job_id: int) -> Dict[str, Any]:
        self._raise_if_not_created()
        return await self._client.get_job_log(self.id, job_id)

    async def status(self) -> Dict[str, Any]:
        self._raise_if_not_created()
        resp = await self._client._get(f'/api/v1alpha/batches/{self.id}')
        self._last_known_status = await resp.json()
        return self._last_known_status

    async def last_known_status(self) -> Dict[str, Any]:
        self._raise_if_not_created()
        if self._last_known_status is None:
            return await self.status()
        return self._last_known_status

    async def wait(self, *, disable_progress_bar: bool = True,
                   description: str = '', progress=None,
                   starting_job: int = 1) -> Dict[str, Any]:
        self._raise_if_not_created()
        i = 0
        while True:
            status = await self.status()
            if status['complete']:
                return status
            j = random.randrange(max(1, int(1.1 ** i)))
            await asyncio.sleep(0.100 * j)
            if i < 64:
                i += 1

    async def debug_info(self, _jobs_query_string=None, _max_jobs=None,
                         _max_job_groups=None):
        self._raise_if_not_created()
        batch_status = await self.status()
        job_groups = []
        async for job_group in self._root_job_group.job_groups():
            if _max_job_groups and len(job_groups) == _max_job_groups:
                break
            job_groups.append({'status': (await job_group.status())})
        jobs = []
        async for j_status in self._root_job_group.jobs(q=_jobs_query_string):
            if _max_jobs and len(jobs) == _max_jobs:
                break
            jid = j_status['job_id']
            log, job = await asyncio.gather(self.get_job_log(jid),
                                            self.get_job(jid))
            jobs.append({'log': log, 'status': job._status})
        return {'status': batch_status, 'jobs': jobs,
                'job_groups': job_groups}

    async def delete(self):
        self._raise_if_not_created()
        try:
            await self._client._delete(f'/api/v1alpha/batches/{self.id}')
        except httpx.ClientResponseError as err:
            if err.status != 404:
                raise

    def create_job(self, image: str, command: List[str], **kwargs) -> Job:
        return self._create_job(
            self._root_job_group,
            {'command': command, 'image': image, 'type': 'docker'}, **kwargs)

    def create_jvm_job(self, jar_spec: Dict[str, str], argv: List[str], *,
                       profile: bool = False, **kwargs):
        if 'always_copy_output' in kwargs:
            raise ValueError(
                "the 'always_copy_output' option is not allowed for JVM jobs")
        job_group = kwargs.pop('job_group', self._root_job_group)
        return self._create_job(
            job_group, {'type': 'jvm', 'jar_spec': jar_spec, 'command': argv,
                        'profile': profile}, **kwargs)

    def create_job_group(self, *, attributes=None, callback=None,
                         cancel_after_n_failures=None) -> JobGroup:
        return self._create_job_group(
            self._root_job_group, attributes=attributes, callback=callback,
            cancel_after_n_failures=cancel_after_n_failures)

    def _create_job(self, job_group: JobGroup, process: dict, *,
                    env: Optional[Dict[str, str]] = None,
                    port: Optional[int] = None,
                    resources: Optional[dict] = None,
                    secrets: Optional[dict] = None,
                    service_account: Optional[str] = None,
                    attributes: Optional[Dict[str, str]] = None,
                    parents: Optional[List[Job]] = None,
                    input_files=None, output_files=None,
                    always_run: bool = False,
                    n_max_attempts: Optional[int] = None,
                    always_copy_output: bool = False,
                    timeout=None, cloudfuse=None,
                    requester_pays_project=None, mount_tokens: bool = False,
                    network: Optional[str] = None, unconfined: bool = False,
                    user_code: Optional[str] = None,
                    regions: Optional[List[str]] = None) -> Job:
        self._in_update_job_id += 1

        if parents is None:
            parents = []
        absolute_parent_ids = []
        in_update_parent_ids = []
        foreign_batches: List[Job] = []
        invalid_job_ids = []
        for parent in parents:
            if not parent.is_submitted:
                if parent._batch != self:
                    foreign_batches.append(parent)
                elif not 0 < parent._job_id < self._in_update_job_id:
                    invalid_job_ids.append(parent._job_id)
                else:
                    in_update_parent_ids.append(parent._job_id)
            elif not self.is_created or parent._batch.id != self.id:
                foreign_batches.append(parent)
            else:
                absolute_parent_ids.append(parent._job_id)

        error_msg = []
        if foreign_batches:
            error_msg.append(
                'Found {} parents from another batch:\n{}'.format(
                    len(foreign_batches),
                    '\n'.join(str(j) for j in foreign_batches)))
        if invalid_job_ids:
            error_msg.append(
                'Found {} parents with invalid job ids:\n{}'.format(
                    len(invalid_job_ids),
                    '\n'.join(str(j) for j in invalid_job_ids)))
        if error_msg:
            raise ValueError('\n'.join(error_msg))

        job_spec: Dict[str, Any] = {
            'always_run': always_run,
            'always_copy_output': always_copy_output,
            'job_id': self._in_update_job_id,
            'absolute_parent_ids': absolute_parent_ids,
            'in_update_parent_ids': in_update_parent_ids,
            'process': process,
        }
        if n_max_attempts is not None:
            job_spec['n_max_attempts'] = n_max_attempts
        if job_group.is_submitted:
            job_spec['absolute_job_group_id'] = job_group._job_group_id
        else:
            job_spec['in_update_job_group_id'] = job_group._job_group_id
        if env:
            job_spec['env'] = [{'name': k, 'value': v}
                               for (k, v) in env.items()]
        if port is not None:
            job_spec['port'] = port
        if resources:
            job_spec['resources'] = resources
        if secrets:
            job_spec['secrets'] = secrets
        if service_account:
            job_spec['service_account'] = service_account
        if timeout:
            job_spec['timeout'] = timeout
        if attributes:
            job_spec['attributes'] = attributes
        if input_files:
            job_spec['input_files'] = [{'from': src, 'to': dst}
                                       for (src, dst) in input_files]
        if output_files:
            job_spec['output_files'] = [{'from': src, 'to': dst}
                                        for (src, dst) in output_files]
        if cloudfuse:
            job_spec['cloudfuse'] = [
                {'bucket': b, 'mount_path': m, 'read_only': ro}
                for (b, m, ro) in cloudfuse]
        if requester_pays_project:
            job_spec['requester_pays_project'] = requester_pays_project
        if mount_tokens:
            job_spec['mount_tokens'] = mount_tokens
        if network:
            job_spec['network'] = network
        if unconfined:
            job_spec['unconfined'] = unconfined
        if user_code:
            job_spec['user_code'] = user_code
        if regions:
            job_spec['regions'] = regions

        self._job_specs.append(job_spec)
        j = Job.unsubmitted_job(self, self._in_update_job_id)
        self._jobs.append(j)
        return j

    def _create_job_group(self, parent_job_group: JobGroup, *,
                          attributes=None, callback=None,
                          cancel_after_n_failures=None) -> JobGroup:
        self._in_update_job_group_id += 1
        spec: Dict[str, Any] = {'job_group_id': self._in_update_job_group_id}
        if attributes is not None:
            spec['attributes'] = attributes
        if callback is not None:
            spec['callback'] = callback
        if cancel_after_n_failures is not None:
            spec['cancel_after_n_failures'] = cancel_after_n_failures
        if parent_job_group.is_submitted:
            spec['absolute_parent_id'] = parent_job_group._job_group_id
        else:
            spec['in_update_parent_id'] = parent_job_group._job_group_id
        self._job_group_specs.append(spec)
        jg = JobGroup.unsubmitted_job_group(self, self._in_update_job_group_id)
        self._job_groups.append(jg)
        return jg

    def _batch_spec(self) -> dict:
        spec: Dict[str, Any] = {
            'billing_project': self._client.billing_project,
            'n_jobs': len(self._job_specs),
            'n_job_groups': len(self._job_group_specs),
            'token': self.token,
        }
        if self.attributes:
            spec['attributes'] = self.attributes
        if self._callback:
            spec['callback'] = self._callback
        if self._cancel_after_n_failures is not None:
            spec['cancel_after_n_failures'] = self._cancel_after_n_failures
        return spec

    async def _open_batch(self) -> Optional[int]:
        resp = await self._client._post('/api/v1alpha/batches/create',
                                        json=self._batch_spec())
        body = await resp.json()
        self._id = body['id']
        self._submission_info = BatchSubmissionInfo(used_fast_path=False)
        return body.get('update_id')

    async def _create_update(self) -> int:
        spec = {'token': secrets.token_urlsafe(16),
                'n_jobs': len(self._job_specs),
                'n_job_groups': len(self._job_group_specs)}
        resp = await self._client._post(
            f'/api/v1alpha/batches/{self.id}/updates/create', json=spec)
        body = await resp.json()
        return int(body['update_id'])

    MAX_BUNCH_BYTESIZE = 1024 * 1024
    MAX_BUNCH_SIZE = 1024

    def _create_bunches(self, job_group_specs: List[dict],
                        job_specs: List[dict], max_bunch_bytesize: int,
                        max_bunch_size: int) -> List[List[SpecBytes]]:
        """Pack serialized specs into size-bounded bunches (reference
        aioclient._create_bunches: job groups first, then jobs)."""
        assert max_bunch_bytesize > 0 and max_bunch_size > 0
        byte_specs = (
            [SpecBytes(json.dumps(s).encode(), SpecType.JOB_GROUP)
             for s in job_group_specs]
            + [SpecBytes(json.dumps(s).encode(), SpecType.JOB)
               for s in job_specs])
        bunches: List[List[SpecBytes]] = []
        bunch: List[SpecBytes] = []
        n_bytes = 0
        for spec in byte_specs:
            assert spec.n_bytes < max_bunch_bytesize, (
                'every spec must be less than max_bunch_bytesize, '
                f'{max_bunch_bytesize}B, but '
                f'{spec.spec_bytes.decode()} is larger')
            if (n_bytes + spec.n_bytes < max_bunch_bytesize
                    and len(bunch) < max_bunch_size):
                bunch.append(spec)
                n_bytes += spec.n_bytes
            else:
                bunches.append(bunch)
                bunch = [spec]
                n_bytes = spec.n_bytes
        if bunch:
            bunches.append(bunch)
        return bunches

    @staticmethod
    def _bunch_json(bunch: List[SpecBytes], typ: 'SpecType') -> list:
        return [json.loads(s.spec_bytes) for s in bunch if s.typ == typ]

    async def _submit_jobs(self, update_id: int, bunch: List[SpecBytes],
                           progress_task=None):
        specs = self._bunch_json(bunch, SpecType.JOB)
        if specs:
            await self._client._post(
                f'/api/v1alpha/batches/{self.id}/updates/{update_id}'
                '/jobs/create', json={'bunch': specs})
        if progress_task is not None:
            progress_task.update(len(specs))

    async def _submit_job_groups(self, update_id: int,
                                 bunch: List[SpecBytes], progress_task=None):
        specs = self._bunch_json(bunch, SpecType.JOB_GROUP)
        if specs:
            await self._client._post(
                f'/api/v1alpha/batches/{self.id}/updates/{update_id}'
                '/job-groups/create', json={'bunch': specs})
        if progress_task is not None:
            progress_task.update(len(specs))

    async def _submit_job_group_bunches(self, update_id: int,
                                        byte_specs_bunches, progress_task=None):
        for bunch in byte_specs_bunches:
            await self._submit_job_groups(update_id, bunch, progress_task)

    async def _submit_job_bunches(self, update_id: int, byte_specs_bunches,
                                  progress_task=None):
        for bunch in byte_specs_bunches:
            await self._submit_jobs(update_id, bunch, progress_task)

    async def _create_fast(self, bunch: List[SpecBytes]) -> Tuple[int, int]:
        body = {'bunch': self._bunch_json(bunch, SpecType.JOB),
                'job_groups': self._bunch_json(bunch, SpecType.JOB_GROUP),
                'batch': self._batch_spec()}
        resp = await self._client._post('/api/v1alpha/batches/create-fast',
                                        json=body)
        out = await resp.json()
        self._id = out['id']
        self._submission_info = BatchSubmissionInfo(used_fast_path=True)
        return out.get('start_job_id') or 1, out.get('start_job_group_id') or 1

    async def _update_fast(self, bunch: List[SpecBytes]) -> Tuple[int, int]:
        body = {'bunch': self._bunch_json(bunch, SpecType.JOB),
                'job_groups': self._bunch_json(bunch, SpecType.JOB_GROUP),
                'update': {'token': secrets.token_urlsafe(16),
                           'n_jobs': len(self._job_specs),
                           'n_job_groups': len(self._job_group_specs)}}
        resp = await self._client._post(
            f'/api/v1alpha/batches/{self.id}/update-fast', json=body)
        out = await resp.json()
        self._submission_info = BatchSubmissionInfo(used_fast_path=True)
        return out['start_job_id'], out.get('start_job_group_id') or 1

    async def _submit_bunches(self, update_id: int,
                              max_bunch_size: Optional[int]):
        if max_bunch_size is None:
            max_bunch_size = self.MAX_BUNCH_SIZE
        url_g = (f'/api/v1alpha/batches/{self.id}/updates/{update_id}'
                 '/job-groups/create')
        url_j = (f'/api/v1alpha/batches/{self.id}/updates/{update_id}'
                 '/jobs/create')
        for i in range(0, len(self._job_group_specs), max_bunch_size):
            bunch = self._job_group_specs[i:i + max_bunch_size]
            await self._client._post(url_g, json={'bunch': bunch})
        for i in range(0, len(self._job_specs), max_bunch_size):
            bunch = self._job_specs[i:i + max_bunch_size]
            await self._client._post(url_j, json={'bunch': bunch})

    async def _commit_update(self, update_id: int) -> Tuple[int, int]:
        resp = await self._client._patch(
            f'/api/v1alpha/batches/{self.id}/updates/{update_id}/commit')
        body = await resp.json()
        return body['start_job_id'], body.get('start_job_group_id', 1)

    async def submit(self, max_bunch_bytesize: Optional[int] = None,
                     max_bunch_size: Optional[int] = None,
                     disable_progress_bar: bool = True,
                     progress=None) -> None:
        if max_bunch_bytesize is None:
            max_bunch_bytesize = self.MAX_BUNCH_BYTESIZE
        if max_bunch_size is None:
            max_bunch_size = self.MAX_BUNCH_SIZE
        bunches = self._create_bunches(self._job_group_specs,
                                       self._job_specs, max_bunch_bytesize,
                                       max_bunch_size)
        if self.is_created:
            # update of an existing batch
            if not bunches:
                return
            if len(bunches) == 1:
                start_job_id, start_jg_id = await self._update_fast(
                    bunches[0])
            else:
                update_id = await self._create_update()
                await self._submit_bunches(update_id, max_bunch_size)
                start_job_id, start_jg_id = await self._commit_update(
                    update_id)
                self._submission_info = BatchSubmissionInfo(
                    used_fast_path=False)
        else:
            start_job_id = start_jg_id = 1
            if len(bunches) == 1:
                # one bunch: create + submit + commit in a single request
                start_job_id, start_jg_id = await self._create_fast(
                    bunches[0])
            else:
                update_id = await self._open_batch()
                if update_id is not None:
                    await self._submit_bunches(update_id, max_bunch_size)
                    start_job_id, start_jg_id = await self._commit_update(
                        update_id)
                else:
                    # empty batch: just close it
                    await self._client._patch(
                        f'/api/v1alpha/batches/{self.id}/close')
            self._root_job_group._submit(None)
        for jg in self._job_groups:
            jg._submit(start_jg_id)
        for j in self._jobs:
            j._submit(start_job_id)
        self._job_group_specs = []
        self._job_groups = []
        self._in_update_job_group_id = 0
        self._job_specs = []
        self._jobs = []
        self._in_update_job_id = 0


class HailExplicitTokenCredentials:
    def __init__(self, token: str):
        self._token = token

    async def auth_headers_with_expiration(self):
        return {'Authorization': f'Bearer {self._token}'}, None

    async def close(self):
        pass


class BatchClient:
    @staticmethod
    async def create(billing_project: str,
                     deploy_config=None,
                     session: Optional[httpx.ClientSession] = None,
                     headers: Optional[Dict[str, str]] = None,
                     _token: Optional[str] = None,
                     token_file: Optional[str] = None, *,
                     cloud_credentials_file: Optional[str] = None):
        url = os.environ.get('HAIL_BATCH_URL')
        if url is None:
            if deploy_config is None:
                from ..services.deploy_config import get_deploy_config
                deploy_config = get_deploy_config()
            url = deploy_config.base_url('batch')
        if headers is None:
            headers = {}
        if _token is not None:
            headers['Authorization'] = f'Bearer {_token}'
        else:
            from ..services.tokens import get_token
            tok = get_token() or 'local-dev'
            headers.setdefault('Authorization', f'Bearer {tok}')
        if session is None:
            session = httpx.client_session()
        return BatchClient(billing_project=billing_project, url=url,
                           session=session, headers=headers)

    def __init__(self, billing_project: str, url: str,
                 session: httpx.ClientSession, headers: Dict[str, str]):
        self.billing_project = billing_project
        self.url = url.rstrip('/')
        self._session = session
        self._headers = headers

    async def _request(self, method: str, path: str, **kwargs):
        tries = 0
        while True:
            try:
                return await self._session.request(
                    method.upper(), self.url + path, headers=self._headers,
                    **kwargs)
            except httpx.ClientResponseError as err:
                if err.status == 401:
                    raise BatchNotAuthenticatedError() from None
                if err.status in _TRANSIENT_STATUSES and tries < 10:
                    tries += 1
                    await _sleep_before_try(tries)
                    continue
                raise
            except aiohttp.ClientResponseError as err:
                if err.status == 401:
                    raise BatchNotAuthenticatedError() from None
                if err.status in _TRANSIENT_STATUSES and tries < 10:
                    tries += 1
                    await _sleep_before_try(tries)
                    continue
                raise
            except (aiohttp.ClientConnectionError,
                    asyncio.TimeoutError):
                if tries < 10:
                    tries += 1
                    await _sleep_before_try(tries)
                    continue
                raise

    async def _get(self, path, params=None):
        return await self._request('GET', path, params=params)

    async def _post(self, path, data=None, json=None):
        return await self._request('POST', path, data=data, json=json)

    async def _patch(self, path):
        return await self._request('PATCH', path)

    async def _delete(self, path):
        return await self._request('DELETE', path)

    def reset_billing_project(self, billing_project):
        self.billing_project = billing_project

    async def list_batches(self, q=None, last_batch_id=None, limit=2 ** 64,
                           version=None):
        if version is None:
            version = 1
        n = 0
        while True:
            params = {}
            if q is not None:
                params['q'] = q
            if last_batch_id is not None:
                params['last_batch_id'] = last_batch_id
            resp = await self._get(f'/api/v{version}alpha/batches',
                                   params=params)
            body = await resp.json()
            for batch in body['batches']:
                if n >= limit:
                    return
                n += 1
                yield Batch(self, batch['id'],
                            attributes=batch.get('attributes'),
                            token=batch['token'], last_known_status=batch)
            last_batch_id = body.get('last_batch_id')
            if last_batch_id is None:
                break

    async def get_job(self, batch_id, job_id):
        b = await self.get_batch(batch_id)
        j_resp = await self._get(
            f'/api/v1alpha/batches/{batch_id}/jobs/{job_id}')
        j = await j_resp.json()
        return Job.submitted_job(b, j['job_id'], _status=j)

    async def get_job_log(self, batch_id, job_id) -> Dict[str, Any]:
        resp = await self._get(
            f'/api/v1alpha/batches/{batch_id}/jobs/{job_id}/log')
        return await resp.json()

    async def get_job_attempts(self, batch_id, job_id):
        resp = await self._get(
            f'/api/v1alpha/batches/{batch_id}/jobs/{job_id}/attempts')
        return await resp.json()

    async def get_batch(self, id) -> Batch:
        resp = await self._get(f'/api/v1alpha/batches/{id}')
        b = await resp.json()
        return Batch(self, id=b['id'], attributes=b.get('attributes'),
                     token=b['token'], last_known_status=b)

    def create_batch(self, attributes=None, callback=None, token=None,
                     cancel_after_n_failures=None) -> Batch:
        return Batch(self, id=None, attributes=attributes, callback=callback,
                     token=token,
                     cancel_after_n_failures=cancel_after_n_failures)

    async def get_billing_project(self, billing_project):
        resp = await self._get(
            f'/api/v1alpha/billing_projects/{billing_project}')
        return await resp.json()

    async def list_billing_projects(self):
        resp = await self._get('/api/v1alpha/billing_projects')
        return await resp.json()

    async def create_billing_project(self, project):
        resp = await self._post(
            f'/api/v1alpha/billing_projects/{project}/create')
        return await resp.json()

    async def add_user(self, user, project):
        resp = await self._post(
            f'/api/v1alpha/billing_projects/{project}/users/{user}/add')
        return await resp.json()

    async def remove_user(self, user, project):
        resp = await self._post(
            f'/api/v1alpha/billing_projects/{project}/users/{user}/remove')
        return await resp.json()

    async def close_billing_project(self, project):
        resp = await self._post(
            f'/api/v1alpha/billing_projects/{project}/close')
        return await resp.json()

    async def reopen_billing_project(self, project):
        resp = await self._post(
            f'/api/v1alpha/billing_projects/{project}/reopen')
        return await resp.json()

    async def delete_billing_project(self, project):
        resp = await self._post(
            f'/api/v1alpha/billing_projects/{project}/delete')
        return await resp.json()

    async def edit_billing_limit(self, project, limit):
        resp = await self._post(f'/api/v1alpha/billing_limits/{project}/edit',
                                json={'limit': limit})
        return await resp.json()

    async def supported_regions(self) -> List[str]:
        resp = await self._get('/api/v1alpha/supported_regions')
        return await resp.json()

    async def default_region(self) -> str:
        resp = await self._get('/api/v1alpha/default_region')
        return await resp.text()

    async def cloud(self) -> str:
        resp = await self._get('/api/v1alpha/cloud')
        return await resp.text()

    async def close(self):
        await self._session.close()
