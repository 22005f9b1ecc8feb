"""Per-partition retry in the execution path (Spark task-retry analogue;
reference ServiceBackend.scala partition re-runs + hailtop/utils
is_transient_error: only transient failures are retried)."""

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


def test_persistent_transient_failure_raises_after_max_attempts():
    backend = hl.current_backend()
    calls = collections.Counter()

    def broken(c):
        calls[c] += 1
        raise OSError('io flake that never heals')

    with pytest.raises(OSError):
        backend.map_collect([7], broken)
    assert calls[7] == 3  # default max_partition_attempts


@pytest.mark.parametrize('exc', [TypeError, ValueError, KeyError,
                                 AttributeError, NotImplementedError])
def test_deterministic_failure_fails_fast(exc):
    """Deterministic bugs re-raise immediately — no wasted re-execution, no
    'attempt 2/3' noise burying the real stack."""
    backend = hl.current_backend()
    calls = collections.Counter()

    def broken(c):
        calls[c] += 1
        raise exc('permanent')

    with pytest.raises(exc):
        backend.map_collect([7], broken)
    assert calls[7] == 1


def test_retry_disabled_by_flag():
    backend = hl.current_backend()
    calls = collections.Counter()

    def broken(c):
        calls[c] += 1
        raise OSError('flake')

    with hl._with_flags(max_partition_attempts='1'):
        with pytest.raises(OSError):
            backend.map_collect([1], broken)
    assert calls[1] == 1
