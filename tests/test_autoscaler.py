"""Batch driver autoscaler: the reference pool's control-loop behaviors
(`/root/reference/batch/batch/driver/instance_collection/pool.py:236-487`)
scoped to the worker-slot pool:

- scale-up toward demand, capped per control-loop iteration
  (remaining_max_new_instances_per_autoscaler_loop),
- hard max bound (max_live_instances / max_instances),
- scale-down only after an idle grace period (worker_max_idle_time),
- never below min_workers,
- demand counts ready + running work (ready_cores + live usage).
"""

import time

from hail_tpu.batch_service.driver import Autoscaler


def test_scale_up_capped_per_loop():
    a = Autoscaler(min_workers=1, max_workers=16, max_scale_per_loop=4,
                   idle_grace_s=10.0)
    assert a.n_slots == 1
    # demand 12 >> slots: each loop adds at most max_scale_per_loop
    assert a.step(n_ready=12, n_running=0) == 5
    assert a.step(n_ready=12, n_running=0) == 9
    assert a.step(n_ready=12, n_running=0) == 12
    # at target: stable
    assert a.step(n_ready=0, n_running=12) == 12


def test_max_bound():
    a = Autoscaler(min_workers=1, max_workers=6, max_scale_per_loop=100,
                   idle_grace_s=10.0)
    assert a.step(n_ready=1000, n_running=0) == 6
    assert a.step(n_ready=1000, n_running=0) == 6


def test_scale_down_waits_for_idle_grace():
    a = Autoscaler(min_workers=1, max_workers=8, max_scale_per_loop=8,
                   idle_grace_s=0.05)
    assert a.step(8, 0) == 8
    # demand drops; within the grace window slots hold steady
    assert a.step(0, 2) == 8
    assert a.step(0, 2) == 8
    time.sleep(0.06)
    # grace elapsed: shed at most max_scale_per_loop, floor at demand
    assert a.step(0, 2) == 2
    # renewed demand cancels the idle clock
    assert a.step(6, 2) == 8


def test_never_below_min():
    a = Autoscaler(min_workers=2, max_workers=8, max_scale_per_loop=8,
                   idle_grace_s=0.0)
    a.step(8, 0)
    a.step(0, 0)      # first under-demand loop starts the idle clock
    time.sleep(0.01)
    assert a.step(0, 0) == 2
    assert a.step(0, 0) == 2


def test_scale_down_capped_per_loop():
    a = Autoscaler(min_workers=1, max_workers=16, max_scale_per_loop=4,
                   idle_grace_s=0.0)
    a.step(16, 0)
    a.step(16, 0)
    a.step(16, 0)
    a.step(16, 0)
    assert a.n_slots == 16
    a.step(0, 0)      # starts the idle clock
    time.sleep(0.01)
    assert a.step(0, 0) == 12
    time.sleep(0.01)
    assert a.step(0, 0) == 8


def test_driver_grows_pool_under_burst():
    """End-to-end: a 12-job burst submitted to a service whose pool starts at
    min_workers=1 is absorbed by autoscaling — all jobs succeed and the slot
    count grew past the floor (reference
    create_instances_from_ready_cores driving the scheduler loop)."""
    import pytest

    from hail_tpu.batch_service import BatchService, BatchServiceClient

    try:
        svc = BatchService.start_in_thread(
            n_workers=8, min_workers=1, max_workers=8)
    except OSError:
        pytest.skip('sockets unavailable in this sandbox')
    try:
        client = BatchServiceClient(f'http://127.0.0.1:{svc.port}')
        bid = client.create_batch()
        client.create_jobs(bid, [
            {'job_id': i + 1, 'spec': {'command': f'sleep 0.2; echo {i}'}}
            for i in range(12)])
        client.close_batch(bid)
        st = client.wait(bid)
        assert st['n_succeeded'] == 12 and st['state'] == 'success'
        assert svc.driver.autoscaler.n_slots > 1
    finally:
        svc.shutdown()
