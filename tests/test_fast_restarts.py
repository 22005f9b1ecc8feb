"""Per-partition execution cache (fast restarts): a re-run of a semantically
identical query executes only the partitions whose results are not already
cached (round-1 verdict item 6; reference ExecutionCache.scala:15-103)."""

import glob
import os

import pytest

import hail_tpu as hl
from hail_tpu.context import Env


@pytest.fixture
def fast_restarts(tmp_path):
    cachedir = str(tmp_path / 'execcache')
    hl._set_flags(use_fast_restarts='1', cachedir=cachedir)
    yield cachedir
    hl._set_flags(use_fast_restarts='0', cachedir='')


@pytest.fixture
def executed_contexts(monkeypatch):
    """Count how many partition contexts the backend actually executes."""
    counts = []
    backend = Env.backend()
    orig = backend.map_collect

    def spy(contexts, fn):
        contexts = list(contexts)
        counts.append(len(contexts))
        return orig(contexts, fn)
    monkeypatch.setattr(backend, 'map_collect', spy)
    return counts


def _query(path):
    t = hl.read_table(path)
    t = t.filter(t.idx % 2 == 0)
    return t.select(sq=t.idx * t.idx)


def test_rerun_skips_completed_partitions(tmp_path, fast_restarts,
                                          executed_contexts):
    p = str(tmp_path / 't.ht')
    hl.utils.range_table(160, n_partitions=16).write(p)
    # the write itself may cache its source partitions (range_table has
    # lineage too); only the query's own entries matter below
    pre = set(glob.glob(os.path.join(fast_restarts, '*.pkl')))
    executed_contexts.clear()

    res1 = _query(p).collect()
    assert sum(executed_contexts) == 16
    files = sorted(set(glob.glob(os.path.join(fast_restarts, '*.pkl'))) - pre)
    assert len(files) == 16

    # simulate a crash at 50%: half the partition results vanish
    for f in files[:8]:
        os.unlink(f)
    executed_contexts.clear()
    res2 = _query(p).collect()
    assert sum(executed_contexts) == 8          # only the missing half ran
    assert res2 == res1

    # a fully-cached rerun executes nothing
    executed_contexts.clear()
    res3 = _query(p).collect()
    assert sum(executed_contexts) == 0
    assert res3 == res1


def test_different_query_misses(tmp_path, fast_restarts, executed_contexts):
    p = str(tmp_path / 't.ht')
    hl.utils.range_table(40, n_partitions=4).write(p)
    executed_contexts.clear()
    t = hl.read_table(p)
    t.select(a=t.idx + 1).collect()
    executed_contexts.clear()
    t2 = hl.read_table(p)
    t2.select(a=t2.idx + 2).collect()           # different expression
    assert sum(executed_contexts) == 4


def test_cache_off_by_default(tmp_path, executed_contexts):
    p = str(tmp_path / 't.ht')
    hl.utils.range_table(40, n_partitions=4).write(p)
    executed_contexts.clear()
    _query(p).collect()
    _query(p).collect()
    assert sum(executed_contexts) == 8
