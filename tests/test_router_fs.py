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


def test_async_multipart_copy(tmp_path):
    """Large files copy via concurrent ranged-read parts (reference
    aiotools/fs/copier.py multi-part engine)."""
    import asyncio
    import numpy as np
    from hail_tpu.fs.aio import Copier, Transfer
    src = tmp_path / 'big.bin'
    data = np.random.default_rng(0).integers(0, 256, 3 * 1024 * 1024 + 17,
                                             dtype=np.uint8).tobytes()
    src.write_bytes(data)
    dest = tmp_path / 'out' / 'big.bin'
    copier = Copier(parallelism=4, part_size=1 << 20)
    reports = asyncio.run(copier.copy(Transfer(str(src), str(dest),
                                               treat_dest_as='file')))
    assert dest.read_bytes() == data
    assert reports[0].bytes_copied == len(data)
    assert reports[0].files_finished == 1


def test_async_dir_copy(tmp_path):
    import asyncio
    from hail_tpu.fs.aio import Copier, Transfer
    src = tmp_path / 'd'
    (src / 'sub').mkdir(parents=True)
    (src / 'a.txt').write_text('aaa')
    (src / 'sub' / 'b.txt').write_text('bbb')
    dest = tmp_path / 'copy'
    asyncio.run(Copier().copy(Transfer(str(src), str(dest),
                                       treat_dest_as='file')))
    assert (dest / 'a.txt').read_text() == 'aaa'
    assert (dest / 'sub' / 'b.txt').read_text() == 'bbb'


def test_async_ranged_read(tmp_path):
    import asyncio
    from hail_tpu.fs.aio import AsyncFS
    p = tmp_path / 'r.bin'
    p.write_bytes(bytes(range(100)))

    async def go():
        fs = AsyncFS()
        async with await fs.open_from(str(p), 10, length=5) as rs:
            return await rs.read()
    assert asyncio.run(go()) == bytes(range(10, 15))
