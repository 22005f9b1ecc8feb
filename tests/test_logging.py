"""Session log: hl.init(log=...) writes per-stage execution records
(reference hail/python/hail/context.py log= + per-stage Spark log lines)."""

import os

import hail_tpu as hl


def test_init_log_records_stages(tmp_path):
    log = str(tmp_path / 'session.log')
    hl.stop()
    hl.init(log=log, quiet=True)
    try:
        t = hl.utils.range_table(100, n_partitions=4)
        assert t.count() == 100
        with open(log) as f:
            content = f.read()
        assert 'stage' in content
        assert 'partition(s)' in content
        assert 'LocalBackend' in content
    finally:
        hl.stop()


def test_log_append_mode(tmp_path):
    log = str(tmp_path / 'session.log')
    hl.stop()
    hl.init(log=log, quiet=True)
    hl.utils.range_table(10, n_partitions=2).count()
    hl.stop()
    size1 = os.path.getsize(log)
    hl.init(log=log, quiet=True, append=True)
    try:
        hl.utils.range_table(10, n_partitions=2).count()
        assert os.path.getsize(log) > size1
    finally:
        hl.stop()


def test_unwritable_log_does_not_crash():
    hl.stop()
    hl.init(log='/proc/definitely/not/writable/x.log', quiet=True)
    try:
        assert hl.utils.range_table(5).count() == 5
    finally:
        hl.stop()
