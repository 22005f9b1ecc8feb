"""Batch service at scale + DB invariants (reference batch/test/
test_scale.py and test_invariants.py scoped to the single-node service)."""

import json
import urllib.request

import pytest

from hail_tpu.batch_service import BatchService, BatchServiceClient


@pytest.fixture(scope='module')
def svc():
    try:
        service = BatchService.start_in_thread(n_workers=8)
    except OSError:
        pytest.skip('sockets unavailable in this sandbox')
    yield service
    service.shutdown()


@pytest.fixture
def client(svc):
    return BatchServiceClient(f'http://127.0.0.1:{svc.port}')


def _invariants(svc):
    req = urllib.request.Request(
        f'http://127.0.0.1:{svc.port}/check_invariants',
        headers={'Authorization': 'Bearer local-dev'})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_scale_many_jobs(svc, client):
    """A few hundred jobs through the autoscaled pool — every one succeeds
    (reference test_scale.py shape, sleep jitter included)."""
    n_jobs = 200
    bid = client.create_batch(attributes={'name': 'scale'})
    client.create_jobs(bid, [
        {'job_id': i + 1,
         'spec': {'command': f'sleep 0.0{i % 3}; echo {i}'}}
        for i in range(n_jobs)])
    client.close_batch(bid)
    st = client.wait(bid, timeout=600.0)
    assert st['state'] == 'success', st
    assert st['n_succeeded'] == n_jobs
    data = _invariants(svc)
    assert data['check_incremental_error'] is None, data
    assert data['check_resource_aggregation_error'] is None, data


def test_invariants_after_mixed_outcomes(svc, client):
    """Invariants hold through failures and cancellation (the reference's
    test_invariants runs against whatever state CI left behind)."""
    bid = client.create_batch()
    client.create_jobs(bid, [
        {'job_id': 1, 'spec': {'command': 'echo ok'}},
        {'job_id': 2, 'spec': {'command': 'exit 7'}},
        {'job_id': 3, 'spec': {'command': 'echo child'}, 'parent_ids': [2]},
        {'job_id': 4, 'spec': {'command': 'echo always'}, 'parent_ids': [2],
         'always_run': True},
    ])
    client.close_batch(bid)
    client.wait(bid)
    b2 = client.create_batch()
    client.create_jobs(b2, [
        {'job_id': 1, 'spec': {'command': 'sleep 30'}}])
    client.close_batch(b2)
    client.cancel_batch(b2)
    client.wait(b2)
    data = _invariants(svc)
    assert data['check_incremental_error'] is None, data
    assert data['check_resource_aggregation_error'] is None, data
