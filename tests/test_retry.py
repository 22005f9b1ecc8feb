"""Per-partition retry in the execution path (Spark task-retry analogue;
reference ServiceBackend.scala partition re-runs)."""

import collections

import pytest

import hail_tpu as hl


def test_transient_partition_failure_is_retried():
    backend = hl.current_backend()
    calls = collections.Counter()

    def flaky(c):
        calls[c] += 1
        if calls[c] < 2:
            raise RuntimeError('transient')
        return c * 2

    assert backend.map_collect([1, 2, 3], flaky) == [2, 4, 6]
    assert all(v == 2 for v in calls.values())


def test_persistent_failure_raises_after_max_attempts():
    backend = hl.current_backend()
    calls = collections.Counter()

    def broken(c):
        calls[c] += 1
        raise ValueError('permanent')

    with pytest.raises(ValueError, match='permanent'):
        backend.map_collect([7], broken)
    assert calls[7] == 3  # default max_partition_attempts


def test_retry_disabled_by_flag():
    backend = hl.current_backend()
    calls = collections.Counter()

    def broken(c):
        calls[c] += 1
        raise ValueError('permanent')

    with hl._with_flags(max_partition_attempts='1'):
        with pytest.raises(ValueError):
            backend.map_collect([1], broken)
    assert calls[1] == 1
