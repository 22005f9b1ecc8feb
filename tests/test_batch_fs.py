import os

import pytest

from hail_tpu import batch as hb
from hail_tpu import fs as hfs


def test_fs_basic(tmp_path):
    p = str(tmp_path / 'a.txt')
    with hfs.open(p, 'w') as f:
        f.write('hello')
    assert hfs.exists(p)
    assert hfs.is_file(p)
    assert hfs.stat(p).size == 5
    with hfs.open(p) as f:
        assert f.read() == 'hello'
    d = str(tmp_path / 'sub')
    hfs.mkdir(d)
    assert hfs.is_dir(d)
    hfs.copy(p, os.path.join(d, 'b.txt'))
    entries = hfs.ls(d)
    assert len(entries) == 1 and entries[0].size == 5
    hfs.remove(p)
    assert not hfs.exists(p)
    hfs.rmtree(d)
    assert not hfs.exists(d)


def test_fs_gz_roundtrip(tmp_path):
    p = str(tmp_path / 'x.txt.gz')
    with hfs.open(p, 'w') as f:
        f.write('compressed')
    with hfs.open(p) as f:
        assert f.read() == 'compressed'


def test_batch_bash_pipeline(tmp_path):
    b = hb.Batch(name='test')
    j1 = b.new_job(name='first')
    j1.command(f'echo "hello" > {j1.ofile}')
    j2 = b.new_job(name='second')
    j2.command(f'cat {j1.ofile} {j1.ofile} > {j2.ofile}')
    out = str(tmp_path / 'out.txt')
    b.write_output(j2.ofile, out)
    run = b.run()
    assert run.status()['state'] == 'success'
    assert open(out).read() == 'hello\nhello\n'


def test_batch_dependencies_and_failure():
    b = hb.Batch(name='fail')
    j1 = b.new_job(name='bad')
    j1.command('exit 3')
    j2 = b.new_job(name='dependent')
    j2.command('echo should-not-run')
    j2.depends_on(j1)
    # reference LocalBackend semantics: a failed batch RAISES; pass the
    # internal flag to inspect terminal states instead
    import subprocess
    import pytest as _pytest
    with _pytest.raises(subprocess.CalledProcessError):
        b.run()
    run = b.run(_raise_on_failure=False)
    s = run.status()
    assert s['state'] == 'failure'
    js = run.job_status()
    assert js[j1._uid] == 'Failed'
    assert js[j2._uid] == 'Cancelled'


def test_batch_read_input(tmp_path):
    src = str(tmp_path / 'in.txt')
    open(src, 'w').write('data123')
    b = hb.Batch()
    inp = b.read_input(src)
    j = b.new_job()
    j.command(f'tr -d "a-z" < {inp} > {j.out}')
    dest = str(tmp_path / 'nums.txt')
    b.write_output(j.out, dest)
    run = b.run()
    assert run.status()['state'] == 'success'
    assert open(dest).read().strip() == '123'


def test_batch_python_job(tmp_path):
    b = hb.Batch()
    j = b.new_python_job(name='py')
    def add(x, y):
        return x + y
    res = j.call(add, 20, 22)
    out = str(tmp_path / 'res.json')
    b.write_output(res.as_json(), out)
    run = b.run()
    assert run.status()['state'] == 'success'
    assert open(out).read() == '42\n'  # reference pyjob writers newline-terminate


def test_batch_python_chain():
    b = hb.Batch()
    j1 = b.new_python_job()
    r1 = j1.call(lambda: 10)
    j2 = b.new_python_job()
    r2 = j2.call(lambda x: x * 2, r1)
    run = b.run()
    assert run.status()['state'] == 'success'


def test_resource_group(tmp_path):
    b = hb.Batch()
    j = b.new_job()
    j.declare_resource_group(out={'bed': '{root}.bed', 'bim': '{root}.bim'})
    j.command(f'echo B > {j.out.bed}; echo M > {j.out.bim}')
    bed = str(tmp_path / 'f.bed')
    bim = str(tmp_path / 'f.bim')
    b.write_output(j.out.bed, bed)
    b.write_output(j.out.bim, bim)
    run = b.run()
    assert run.status()['state'] == 'success'
    assert open(bed).read() == 'B\n'
    assert open(bim).read() == 'M\n'


def test_dry_run(capsys):
    b = hb.Batch()
    j = b.new_job(name='dry')
    j.command('echo test')
    run = b.run(dry_run=True)
    out = capsys.readouterr().out
    assert 'echo test' in out


def test_batch_pool_executor():
    with hb.BatchPoolExecutor(max_workers=2) as ex:
        fut = ex.submit(lambda: 7)
        assert fut.result() == 7
        assert ex.map(lambda x: x * x, [1, 2, 3]) == [1, 4, 9]


def test_service_backend_runs_via_rest():
    # ServiceBackend is no longer gated: it auto-starts the single-node
    # batch service and submits over REST (tests/test_batch_service.py has
    # the full coverage)
    be = hb.ServiceBackend(billing_project='x')
    try:
        b = hb.Batch(backend=be)
        b.new_job().command('true')
        run = b.run()
        assert run.status()['state'] == 'success'
    finally:
        be.close()
