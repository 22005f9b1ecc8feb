"""Sync REST client for the single-node Batch service (the shape of
`hailtop/batch_client`'s sync client over the reference's /api/v1alpha
routes)."""

from __future__ import annotations

import json
import time
import urllib.request
from typing import List, Optional


class BatchServiceClient:
    def __init__(self, url: str, token: Optional[str] = None):
        """`token`: session token sent as `Authorization: Bearer ...` when
        the service has auth enabled (reference batch_client attaches
        hailtop.auth service_auth_headers). Defaults to the stored token
        for the 'default' namespace, if any."""
        self.url = url.rstrip('/')
        if token is None:
            from ..services.tokens import get_token
            token = get_token() or 'local-dev'
        self.token = token

    def _req(self, method: str, path: str, body: Optional[dict] = None) -> dict:
        data = None if body is None else json.dumps(body).encode()
        headers = {'Content-Type': 'application/json'}
        if self.token:
            headers['Authorization'] = f'Bearer {self.token}'
        req = urllib.request.Request(
            f'{self.url}/api/v1alpha{path}', data=data, method=method,
            headers=headers)
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read() or b'{}')

    # -- batches ------------------------------------------------------------
    def create_batch(self, attributes: Optional[dict] = None,
                     billing_project: str = 'local',
                     cancel_after_n_failures: Optional[int] = None) -> int:
        import secrets as _secrets
        return self._req('POST', '/batches/create', {
            'attributes': attributes or {},
            'billing_project': billing_project,
            'cancel_after_n_failures': cancel_after_n_failures,
            'token': _secrets.token_urlsafe(16),
            'n_jobs': 0,
        })['id']

    def create_jobs(self, batch_id: int, bunch: List[dict]) -> List[int]:
        return self._req('POST', f'/batches/{batch_id}/jobs/create',
                         {'bunch': bunch})['job_ids']

    def close_batch(self, batch_id: int) -> None:
        self._req('PATCH', f'/batches/{batch_id}/close')

    def get_batch(self, batch_id: int) -> dict:
        return self._req('GET', f'/batches/{batch_id}')

    def list_jobs(self, batch_id: int) -> List[dict]:
        return self._req('GET', f'/batches/{batch_id}/jobs')['jobs']

    def get_job(self, batch_id: int, job_id: int) -> dict:
        return self._req('GET', f'/batches/{batch_id}/jobs/{job_id}')

    def get_job_log(self, batch_id: int, job_id: int) -> str:
        return self._req('GET', f'/batches/{batch_id}/jobs/{job_id}/log')['main']

    def cancel_batch(self, batch_id: int) -> None:
        self._req('PATCH', f'/batches/{batch_id}/cancel')

    def delete_batch(self, batch_id: int) -> None:
        self._req('DELETE', f'/batches/{batch_id}')

    # -- nested job groups (reference batch_client create_job_group) --------
    def create_job_groups(self, batch_id: int, bunch: List[dict]) -> List[int]:
        """bunch: [{'job_group_id': g, 'absolute_parent_id': p,
        'attributes': {...}}, ...]"""
        return self._req('POST', f'/batches/{batch_id}/job-groups/create',
                         {'bunch': bunch})['job_group_ids']

    def get_job_group(self, batch_id: int, group_id: int) -> dict:
        return self._req('GET', f'/batches/{batch_id}/job-groups/{group_id}')

    def list_job_groups(self, batch_id: int, group_id: int = 0) -> List[dict]:
        return self._req(
            'GET', f'/batches/{batch_id}/job-groups/{group_id}/job-groups'
        )['job_groups']

    def list_job_group_jobs(self, batch_id: int, group_id: int) -> List[dict]:
        return self._req(
            'GET', f'/batches/{batch_id}/job-groups/{group_id}/jobs')['jobs']

    def cancel_job_group(self, batch_id: int, group_id: int) -> None:
        self._req('PATCH', f'/batches/{batch_id}/job-groups/{group_id}/cancel')

    # -- resource usage / billing --------------------------------------------
    def job_resource_usage(self, batch_id: int, job_id: int) -> dict:
        return self._req(
            'GET', f'/batches/{batch_id}/jobs/{job_id}/resource_usage'
        )['resource_usage']

    def billing_projects(self) -> List[dict]:
        return self._req('GET', '/billing_projects')

    def billing_project(self, name: str) -> dict:
        return self._req('GET', f'/billing_projects/{name}')

    def edit_billing_project(self, name: str, limit: Optional[float]) -> dict:
        return self._req('POST', f'/billing_projects/{name}/edit',
                         {'limit': limit})

    def wait(self, batch_id: int, timeout: float = 300.0,
             poll: float = 0.05) -> dict:
        t0 = time.time()
        while True:
            st = self.get_batch(batch_id)
            if st['complete']:
                return st
            if time.time() - t0 > timeout:
                raise TimeoutError(f'batch {batch_id} not complete: {st}')
            time.sleep(poll)
