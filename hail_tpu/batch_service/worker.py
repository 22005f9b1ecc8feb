"""Batch worker: executes one job attempt as an isolated subprocess.

The reference worker (`/root/reference/batch/batch/worker/worker.py`) runs
each job as docker containers (input-copy / main / output-copy) with a
per-job /io volume, netns isolation, and cgroup limits. The single-host
analogue here:

  * three "containers" per job: `input` (localize input_files), `main`
    (the command under rlimits + optional timeout), `output` (publish
    output_files) — each with its own log and container status, so the
    client's `_get_exit_code(status, 'main')` contract holds.
  * per-job /io isolation via a private mount namespace when running as
    root (`unshare -m` + bind-mount of the job scratch dir onto /io,
    mirroring the reference's volume mount); otherwise commands see the
    scratch dir through the HAIL_IO_DIR env var.
  * rlimits for memory/cpu/file-size (reference cgroup limits) and
    SIGKILL on timeout (reference JobTimeoutError).

File transfer supports local paths (optionally file://) with trailing
wildcards, like the reference Copier limited to the local scheme (cloud
schemes are gated in this zero-egress build).
"""

from __future__ import annotations

import glob as globmod
import os
import shutil
import subprocess
import time
from typing import Dict, List, Optional, Tuple


def _now_ms() -> int:
    return int(time.time() * 1000)


def _strip_scheme(path: str) -> Optional[str]:
    if path.startswith('file://'):
        return path[len('file://'):]
    if '://' in path:
        return None          # cloud scheme: gated
    return path


def _copy_files(pairs: List[Tuple[str, str]], io_dir: str,
                direction: str) -> Tuple[int, str]:
    """Run one transfer list; returns (exit_code, log). `/io/...` paths map
    into io_dir."""
    logs = []

    def map_io(p: str) -> str:
        if p == '/io' or p.startswith('/io/'):
            return io_dir + p[len('/io'):]
        return p

    for src, dst in pairs:
        s = _strip_scheme(src)
        d = _strip_scheme(dst)
        if s is None or d is None:
            logs.append(f'cannot copy {src} -> {dst}: '
                        'cloud schemes are gated in this build')
            return 1, '\n'.join(logs)
        s, d = map_io(s), map_io(d)
        srcs = globmod.glob(s) if any(c in s for c in '*?[') else [s]
        if not srcs:
            logs.append(f'no files found at {src}')
            return 1, '\n'.join(logs)
        single = len(srcs) == 1 and srcs == [s]
        for one in srcs:
            try:
                if os.path.isdir(one):
                    if single and not d.endswith('/'):
                        # `cp -r src dst` with dst absent: dst IS the copy
                        target = d
                    else:
                        target = os.path.join(
                            d, os.path.basename(one.rstrip('/')))
                    shutil.copytree(one, target, dirs_exist_ok=True)
                    logs.append(f'copied tree {one} -> {target}')
                else:
                    if d.endswith('/') or len(srcs) > 1 or os.path.isdir(d):
                        os.makedirs(d, exist_ok=True)
                        target = os.path.join(d, os.path.basename(one))
                    else:
                        os.makedirs(os.path.dirname(d) or '.', exist_ok=True)
                        target = d
                    shutil.copyfile(one, target)
                    logs.append(f'copied {one} -> {target}')
            except OSError as e:
                logs.append(f'copy {one} -> {d} failed: {e}')
                return 1, '\n'.join(logs)
    return 0, '\n'.join(logs)


_CAN_UNSHARE: Optional[bool] = None
_CAN_OVERLAY: Optional[bool] = None

# storage quota defaults: the reference gives every job a quota'd XFS rootfs
# (worker.py:460 cloudfuse/XFS quota disks); default request mirrors the
# reference's ~5Gi-per-quarter-core, capped so a tmpfs quota can't exhaust RAM
_DEFAULT_STORAGE_BYTES = 5 * 1024**3
_MAX_STORAGE_BYTES = 32 * 1024**3

_SIZE_SUFFIXES = {
    'K': 1000, 'M': 1000**2, 'G': 1000**3, 'T': 1000**4, 'P': 1000**5,
    'Ki': 1024, 'Mi': 1024**2, 'Gi': 1024**3, 'Ti': 1024**4, 'Pi': 1024**5,
}


def parse_storage_bytes(s) -> Optional[int]:
    """'10Gi' / '500M' / bare bytes -> int, or None if unparseable."""
    if s is None:
        return None
    if isinstance(s, (int, float)):
        return int(s)
    s = str(s).strip()
    for suf in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suf):
            try:
                return int(float(s[:-len(suf)]) * _SIZE_SUFFIXES[suf])
            except ValueError:
                return None
    try:
        return int(s)
    except ValueError:
        return None


# memory quota: reference workers bill memory per core by worker type
# (standard 3.75 GiB/core); a job gets its request (or the cpu-derived
# default) as an address-space rlimit, giving real allocation failures
_MEM_PER_CORE = {'lowmem': 1 * 1024**3, 'standard': int(3.75 * 1024**3),
                 'highmem': int(7.5 * 1024**3)}

_OOM_MARKERS = ('MemoryError', 'std::bad_alloc', 'Out of memory',
                'Cannot allocate memory', 'oom-kill')


def _memory_limit_bytes(resources: dict) -> Optional[int]:
    mem = resources.get('memory_bytes')
    if mem:
        return int(mem)
    memory = resources.get('memory')
    cpu = resources.get('cpu')
    if memory is None and cpu is None:
        return None              # no request: unlimited (internal jobs)
    mcpu = 1000
    if cpu is not None:
        try:
            v = str(cpu)
            mcpu = int(float(v[:-1])) if v.endswith('m') \
                else int(float(v) * 1000)
        except ValueError:
            pass
    if isinstance(memory, str) and memory in _MEM_PER_CORE:
        return int(_MEM_PER_CORE[memory] * mcpu / 1000)
    if memory is not None:
        b = parse_storage_bytes(memory)
        if b:
            return b
    return int(_MEM_PER_CORE['standard'] * mcpu / 1000)


def _looks_oom(rc: Optional[int], log_text: str) -> bool:
    if rc in (-9, 137):
        return True
    tail = log_text[-4000:]
    return any(m in tail for m in _OOM_MARKERS)


def _can_unshare() -> bool:
    """Private mount namespaces need root (or CAP_SYS_ADMIN) and a working
    `unshare`; probed once."""
    global _CAN_UNSHARE
    if _CAN_UNSHARE is None:
        try:
            rc = subprocess.run(
                ['unshare', '-m', 'true'], stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, timeout=10).returncode
            _CAN_UNSHARE = (rc == 0)
        except (OSError, subprocess.TimeoutExpired):
            _CAN_UNSHARE = False
    return _CAN_UNSHARE


def _can_overlay() -> bool:
    """Quota'd-rootfs isolation needs root: tmpfs + overlayfs(lowerdir=/) +
    chroot inside a private mount ns; probed once."""
    global _CAN_OVERLAY
    if _CAN_OVERLAY is None:
        if not _can_unshare():
            _CAN_OVERLAY = False
            return False
        import tempfile
        probe = tempfile.mkdtemp(prefix='hail-ov-probe-')
        script = (
            'set -e; mount -t tmpfs -o size=1M tmpfs "$1"; '
            'mkdir -p "$1/u" "$1/w" "$1/m"; '
            'mount -t overlay overlay -o '
            'lowerdir=/,upperdir="$1/u",workdir="$1/w" "$1/m"; '
            'chroot "$1/m" /bin/true')
        try:
            rc = subprocess.run(
                ['unshare', '-m', '/bin/sh', '-c', script, 'probe', probe],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=20).returncode
            _CAN_OVERLAY = (rc == 0)
        except (OSError, subprocess.TimeoutExpired):
            _CAN_OVERLAY = False
        finally:
            shutil.rmtree(probe, ignore_errors=True)
    return _CAN_OVERLAY


class JobResult:
    def __init__(self):
        self.container_statuses: Dict[str, Optional[dict]] = {
            'input': None, 'main': None, 'output': None}
        self.logs: Dict[str, str] = {}
        self.exit_code: Optional[int] = None    # of the first failing step
        self.error: Optional[str] = None
        self.timed_out = False
        self.duration_ms = 0

    @property
    def ok(self) -> bool:
        return self.error is None and self.exit_code == 0 and not self.timed_out


def _container_status(state: str, exit_code: Optional[int], t0: int, t1: int,
                      error: Optional[str] = None,
                      out_of_memory: bool = False) -> dict:
    # the client contract (aioclient.Job._get_exit_code): exit codes live at
    # container_statuses[task]['container_status']['exit_code'], durations at
    # ['timing']['runtime']['duration'], and a non-None ['error'] hides them
    return {
        'name': state, 'state': 'succeeded' if exit_code == 0 else 'failed',
        'error': error,
        'container_status': {'exit_code': exit_code,
                             'out_of_memory': out_of_memory},
        'timing': {'runtime': {'start_time': t0, 'finish_time': t1,
                               'duration': t1 - t0}},
    }


def run_job_attempt(spec: dict, io_dir: str, log_dir: str,
                    cancel_check=None) -> JobResult:
    """Execute one attempt of `spec` (the client job spec: process{command},
    env[], resources{}, timeout, input_files, output_files). Blocking — the
    driver calls this on an executor thread."""
    res = JobResult()
    os.makedirs(log_dir, exist_ok=True)
    t_start = _now_ms()

    resources = spec.get('resources') or {}
    storage_bytes = parse_storage_bytes(resources.get('storage'))
    if storage_bytes is None or storage_bytes <= 0:
        storage_bytes = _DEFAULT_STORAGE_BYTES
    storage_bytes = min(storage_bytes, _MAX_STORAGE_BYTES)

    # Quota'd rootfs (reference XFS-quota'd container rootfs + /io volume,
    # worker.py:460): a tmpfs of the storage request holds the overlay upper
    # AND /io, so rootfs and /io writes share one quota with real ENOSPC
    # semantics. The tmpfs is mounted in the HOST namespace so /io survives
    # the job process for the output-copy step; the overlay+chroot happen in
    # the job's private mount ns and vanish with it.
    # overlay isolation applies to docker-type jobs (the external API
    # surface); legacy internal jobs (QoB partitions, DSL helpers) write
    # host paths directly and run under the plain /io bind
    is_docker = (spec.get('process') or {}).get('type') == 'docker'
    ov_dir = None
    if is_docker and _can_overlay():
        ov_dir = io_dir.rstrip('/') + '.ov'
        os.makedirs(ov_dir, exist_ok=True)
        rc = subprocess.run(
            ['mount', '-t', 'tmpfs', '-o', f'size={storage_bytes}',
             'tmpfs', ov_dir], capture_output=True, text=True).returncode
        if rc != 0:
            ov_dir = None
    if ov_dir is not None:
        io_dir = os.path.join(ov_dir, 'u', 'io')
        os.makedirs(os.path.join(ov_dir, 'w'), exist_ok=True)
        os.makedirs(os.path.join(ov_dir, 'm'), exist_ok=True)
    os.makedirs(io_dir, exist_ok=True)
    try:
        return _run_job_attempt_inner(spec, io_dir, log_dir, cancel_check,
                                      res, t_start, ov_dir, resources)
    finally:
        if ov_dir is not None:
            subprocess.run(['umount', '-l', ov_dir], capture_output=True)
            shutil.rmtree(ov_dir, ignore_errors=True)


def _run_job_attempt_inner(spec: dict, io_dir: str, log_dir: str,
                           cancel_check, res: JobResult, t_start: int,
                           ov_dir: Optional[str],
                           resources: dict) -> JobResult:
    inputs = [(f['from'], f['to']) for f in spec.get('input_files') or []]
    if inputs:
        t0 = _now_ms()
        rc, log = _copy_files(inputs, io_dir, 'input')
        t1 = _now_ms()
        res.logs['input'] = log
        res.container_statuses['input'] = _container_status('input', rc, t0, t1)
        if rc != 0:
            res.exit_code = rc
            res.duration_ms = t1 - t_start
            return res

    process = spec.get('process') or {}
    command = process.get('command') or spec.get('command') or ['true']
    if not isinstance(command, list):
        command = ['/bin/bash', '-c', str(command)]
    env = dict(os.environ)
    spec_env = spec.get('env')
    if isinstance(spec_env, dict):        # legacy internal shape
        env.update({k: str(v) for k, v in spec_env.items()})
    else:
        for e in spec_env or []:
            if isinstance(e, dict):
                env[e['name']] = str(e['value'])
    env['HAIL_IO_DIR'] = '/io' if ov_dir is not None else io_dir
    env['HAIL_BATCH_ID'] = str(spec.get('batch_id', 0))
    env['HAIL_JOB_ID'] = str(spec.get('job_id', 0))
    port = spec.get('port')
    if port is not None:
        env['HAIL_BATCH_WORKER_PORT'] = str(port)
        env['HAIL_BATCH_WORKER_IP'] = '127.0.0.1'

    if ov_dir is not None:
        # overlay(lowerdir=/) over the quota tmpfs upper, /proc /dev /sys
        # rebound, then chroot: the job sees a private, size-limited rootfs
        # whose /io is the upper's io dir (already holding localized inputs)
        setup = (
            'set -e; '
            'mount -t overlay overlay -o '
            'lowerdir=/,upperdir="$HAIL_OV/u",workdir="$HAIL_OV/w" '
            '"$HAIL_OV/m"; '
            'for d in proc dev sys; do '
            'mount --rbind "/$d" "$HAIL_OV/m/$d" 2>/dev/null || true; done; '
            'cd "$HAIL_OV/m"; exec chroot . "$@"')
        env['HAIL_OV'] = ov_dir
        argv = ['unshare', '-m', '/bin/sh', '-c', setup, 'hail-job'] + command
    elif _can_unshare():
        # no quota available: private mount ns + bind of the scratch dir
        env['HAIL_IO_HOST_DIR'] = io_dir
        argv = (['unshare', '-m', '/bin/sh', '-c',
                 'mkdir -p /io && mount --bind "$HAIL_IO_HOST_DIR" /io '
                 '&& exec "$@"',
                 'hail-job'] + command)
        env['HAIL_IO_DIR'] = '/io'
    else:
        argv = command

    mem_limit = _memory_limit_bytes(resources)

    def _limits():
        import resource as _res
        if mem_limit:
            _res.setrlimit(_res.RLIMIT_AS, (mem_limit, mem_limit))
        cpu_s = resources.get('cpu_seconds')
        if cpu_s:
            _res.setrlimit(_res.RLIMIT_CPU, (int(cpu_s), int(cpu_s)))
        fsz = resources.get('max_file_bytes')
        if fsz:
            _res.setrlimit(_res.RLIMIT_FSIZE, (int(fsz), int(fsz)))

    main_log = os.path.join(log_dir, 'main.log')
    t0 = _now_ms()
    timed_out = False
    try:
        with open(main_log, 'wb') as lf:
            proc = subprocess.Popen(
                argv, stdout=lf, stderr=subprocess.STDOUT, env=env,
                start_new_session=True,
                preexec_fn=_limits if resources else None)
            timeout = spec.get('timeout')
            deadline = (time.time() + float(timeout)) if timeout else None
            while True:
                try:
                    rc = proc.wait(timeout=0.2)
                    break
                except subprocess.TimeoutExpired:
                    if deadline is not None and time.time() > deadline:
                        timed_out = True
                        _kill_group(proc)
                        rc = proc.wait()
                        break
                    if cancel_check is not None and cancel_check():
                        _kill_group(proc)
                        rc = proc.wait()
                        break
    except OSError as e:
        res.error = f'error starting job process: {e}'
        res.container_statuses['main'] = _container_status(
            'main', None, t0, _now_ms(), error=res.error)
        res.duration_ms = _now_ms() - t_start
        return res
    t1 = _now_ms()
    res.timed_out = timed_out
    with open(main_log, 'rb') as f:
        res.logs['main'] = f.read().decode('utf-8', 'replace')
    err = ('ContainerTimeoutError: container timed out after '
           f'{spec.get("timeout")}s') if timed_out else None
    oom = (mem_limit is not None and not timed_out and rc not in (0, None)
           and _looks_oom(rc, res.logs['main']))
    res.container_statuses['main'] = _container_status('main', rc, t0, t1,
                                                       error=err,
                                                       out_of_memory=oom)
    res.exit_code = rc
    if timed_out:
        res.error = err
    if rc == 0 and not timed_out:
        outputs = [(f['from'], f['to']) for f in spec.get('output_files') or []]
        if outputs:
            t0o = _now_ms()
            rco, logo = _copy_files(outputs, io_dir, 'output')
            t1o = _now_ms()
            res.logs['output'] = logo
            res.container_statuses['output'] = _container_status(
                'output', rco, t0o, t1o)
            if rco != 0:
                res.exit_code = rco
    res.duration_ms = _now_ms() - t_start
    return res


def _kill_group(proc: subprocess.Popen) -> None:
    import signal
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        try:
            proc.kill()
        except ProcessLookupError:
            pass
