"""Query-on-Batch ServiceBackend (reference ServiceBackend.scala:196-300):
partitions run as jobs of the single-node Batch service, with per-partition
retry and failure surfacing."""

import os

import pytest

import hail_tpu as hl
from hail_tpu.backend.service_backend import ServiceBackend


@pytest.fixture(scope='module')
def backend():
    b = ServiceBackend(n_workers=4)
    yield b
    b.stop()


def test_map_collect_subprocess(backend):
    out = backend.map_collect(list(range(6)), lambda c: c * c)
    assert out == [0, 1, 4, 9, 16, 25]


def test_failure_injection_retry(backend, tmp_path):
    """First attempt of partition 2 crashes; the service re-attempts it
    (n_max_attempts=3) and the stage completes (reference QoB re-runs failed
    partitions; failure_injecting_client_session.py is the reference's
    fault-injection idiom)."""
    marker = str(tmp_path / 'attempted')

    def fn(c):
        if c == 2 and not os.path.exists(marker):
            open(marker, 'w').close()
            raise RuntimeError('injected transient failure')
        return c + 100

    out = backend.map_collect([0, 1, 2, 3], fn)
    assert out == [100, 101, 102, 103]
    assert os.path.exists(marker)


def test_permanent_failure_surfaces_log(backend):
    def fn(c):
        if c == 1:
            raise ValueError('partition is cursed')
        return c

    with pytest.raises(RuntimeError, match='partition is cursed'):
        backend.map_collect([0, 1, 2], fn)


def test_inline_threshold(backend):
    # single-partition stages run inline on the driver (no subprocess)
    out = backend.map_collect([41], lambda c: c + 1)
    assert out == [42]


def test_query_pipeline_on_qob():
    hl.init(backend='service', idempotent=False)
    try:
        assert isinstance(hl.current_backend(), ServiceBackend)
        t = hl.utils.range_table(60, 6)
        t = t.annotate(y=t.idx % 5)
        g = t.group_by(t.y).aggregate(n=hl.agg.count())
        rows = g.collect()
        assert sorted((r.y, r.n) for r in rows) == [(i, 12) for i in range(5)]
    finally:
        hl.stop()
        hl.init()   # restore default local backend for subsequent tests


def test_streaming_drain_bounded_window(backend):
    """Results are read while the stage runs, through a sliding window of at
    most MAX_CONCURRENT_PARTITION_READS concurrent reads (reference
    ServiceBackend.scala:255-268 drain loop)."""
    from hail_tpu.backend.service_backend import MAX_CONCURRENT_PARTITION_READS

    out = backend.map_collect(list(range(12)), lambda c: c * c)
    assert out == [c * c for c in range(12)]
    stats = backend._drain_stats
    assert stats['max_inflight'] <= MAX_CONCURRENT_PARTITION_READS
    # with 12 jobs on 4 workers, some results must stream back before the
    # batch is terminal
    assert stats['reads_while_running'] > 0


def test_straggler_redrain(backend):
    """A completion listing that races job completion (reference comment at
    ServiceBackend.scala:225-233: end_time ordering is not enforced) must not
    lose partitions: the post-Success straggler pass reads whatever the
    listings missed."""
    real = backend._list_completed_jobs
    dropped = set()

    def racy_listing(bid):
        jobs = real(bid)
        # simulate the race: never report jobs 2 and 5 as complete
        out = []
        for j in jobs:
            if j['job_id'] in (2, 5):
                dropped.add(j['job_id'])
                continue
            out.append(j)
        return out

    backend._list_completed_jobs = racy_listing
    try:
        out = backend.map_collect(list(range(8)), lambda c: c + 7)
    finally:
        backend._list_completed_jobs = real
    assert out == [c + 7 for c in range(8)]
    assert dropped == {2, 5}
    assert backend._drain_stats['stragglers'] == 2
