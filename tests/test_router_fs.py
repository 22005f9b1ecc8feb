"""RouterFS scheme gating: cloud paths must raise, never silently fall
through to a literal local ``gs:`` directory (reference `io/fs/RouterFS.scala`
routes by scheme and errors on unconfigured filesystems)."""

import os

import pytest

import hail_tpu as hl
from hail_tpu.fs import local_path


def test_gs_write_raises(tmp_path):
    t = hl.utils.range_table(3)
    with pytest.raises(ValueError, match="scheme 'gs' is not available"):
        t.write('gs://some-bucket/foo.ht')
    assert not os.path.exists('gs:')


def test_gs_read_raises():
    with pytest.raises(ValueError, match="not available"):
        hl.read_table('gs://some-bucket/foo.ht')


def test_gs_export_raises():
    t = hl.utils.range_table(3)
    with pytest.raises(ValueError, match="not available"):
        t.export('gs://some-bucket/foo.tsv')


def test_gs_blockmatrix_raises():
    import numpy as np
    from hail_tpu.linalg import BlockMatrix
    bm = BlockMatrix.from_numpy(np.eye(4))
    with pytest.raises(ValueError, match="not available"):
        bm.write('s3://bucket/bm')


def test_file_scheme_strips(tmp_path):
    p = str(tmp_path / 'out.ht')
    hl.utils.range_table(3).write(f'file://{p}')
    assert os.path.isdir(p)
    assert hl.read_table(f'file://{p}').count() == 3


def test_local_path_passthrough():
    assert local_path('/tmp/x') == '/tmp/x'
    assert local_path('relative/x') == 'relative/x'
    assert local_path('file:///tmp/x') == '/tmp/x'
