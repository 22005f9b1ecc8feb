"""Worker program for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost.py as:
    python multihost_worker.py <coordinator> <n_processes> <process_id>

Exercises the multihost backend end-to-end: alltoall_bytes, map_collect,
an aggregation, and a distributed order_by whose range exchange is
point-to-point (no process materializes the whole table).
"""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coord, n_proc, pid)
    assert jax.process_count() == n_proc

    import numpy as np

    import hail_tpu as hl
    from hail_tpu.backend.distributed import MultihostBackend, alltoall_bytes
    from hail_tpu.context import Env

    hl.init(backend='multihost', global_seed=0)
    be = Env.backend()
    assert isinstance(be, MultihostBackend) and be.process_count == n_proc

    # 1. per-destination byte exchange
    payloads = [f'from{pid}to{j}'.encode() * (j + 1) for j in range(n_proc)]
    got = alltoall_bytes(payloads)
    for i, blob in enumerate(got):
        assert blob == f'from{i}to{pid}'.encode() * (pid + 1), (i, blob)
    print(f'[p{pid}] alltoall ok', flush=True)

    # 2. map_collect merges results from both processes
    res = be.map_collect(list(range(10)), lambda c: c * c)
    assert res == [c * c for c in range(10)], res
    print(f'[p{pid}] map_collect ok', flush=True)

    # 3. aggregation over a partitioned table
    t = hl.utils.range_table(1000, n_partitions=8)
    total = t.aggregate(hl.agg.sum(t.idx))
    assert total == 499500, total
    print(f'[p{pid}] aggregate ok', flush=True)

    # 4. distributed order_by: descending sort via range exchange
    t2 = t.annotate(neg=999 - t.idx)
    s = t2.order_by('neg')
    # no process saw the whole table during the shuffle: partitions live on
    # their owners; collect() merges via the data plane afterwards.
    rows = s.collect()
    negs = [r.neg for r in rows]
    assert negs == sorted(negs), 'order_by result not sorted'
    assert len(rows) == 1000
    assert [r.idx for r in rows[:3]] == [999, 998, 997], rows[:3]
    print(f'[p{pid}] order_by ok', flush=True)

    print(f'[p{pid}] ALL OK', flush=True)


if __name__ == '__main__':
    main()
