"""Session context: `hl.init`, the Env singleton, flags.

Parity with reference `hail/python/hail/context.py` + `utils/java.py:38` (Env)
+ `HailFeatureFlags` — a fresh, JVM-free implementation. Backend selection is
local (default) or multihost (jax.distributed); there is no Spark.
"""

from __future__ import annotations

import os
import random
import sys
import time
from typing import Dict, Optional

from .backend.backend import Backend, LocalBackend


DEFAULT_FLAGS: Dict[str, str] = {
    # mirrors the spirit of HailFeatureFlags.scala:16-52
    'strict_invariants': '0',
    'jit_threshold_rows': '4096',      # min rows before shipping an op to jax
    'branching_factor': '50',
    'shuffle_cutoff_to_local_sort': str(512 * 1024 * 1024),
    'use_fast_restarts': '0',
    'cachedir': '',
    'rng_nonce': '0',
}


class HailContext:
    def __init__(self, backend: Backend, log: str, quiet: bool, append: bool,
                 tmp_dir: str, local_tmpdir: str, default_reference: str,
                 global_seed: Optional[int], branching_factor: int):
        self.backend = backend
        self.log = log
        self.quiet = quiet
        self.tmp_dir = tmp_dir
        self.local_tmpdir = local_tmpdir
        self.branching_factor = branching_factor
        self.flags = dict(DEFAULT_FLAGS)
        self._seed_counter = global_seed if global_seed is not None else 0
        from .genetics.reference_genome import set_default_reference
        set_default_reference(default_reference)


class Env:
    _hc: Optional[HailContext] = None

    @classmethod
    def hc(cls) -> HailContext:
        if cls._hc is None:
            init()
        return cls._hc

    @classmethod
    def backend(cls) -> Backend:
        return cls.hc().backend

    @classmethod
    def next_seed(cls) -> int:
        hc = cls.hc()
        hc._seed_counter += 1
        return hc._seed_counter

    @classmethod
    def is_initialized(cls) -> bool:
        return cls._hc is not None


def init(backend: str = 'local',
         sc=None,
         app_name: Optional[str] = None,
         master: Optional[str] = None,
         local: str = 'local[*]',
         log: Optional[str] = None,
         quiet: bool = False,
         append: bool = False,
         min_block_size: int = 0,
         branching_factor: int = 50,
         tmp_dir: Optional[str] = None,
         default_reference: str = 'GRCh37',
         idempotent: bool = False,
         global_seed: Optional[int] = None,
         local_tmpdir: Optional[str] = None,
         n_threads: Optional[int] = None,
         **kwargs) -> None:
    """Initialize the session. `backend` is 'local' or 'multihost'
    (cf. reference hl.init's spark/batch/local, context.py:159-290)."""
    if Env._hc is not None:
        if idempotent:
            return
        Env._hc.backend.stop()
        Env._hc = None
    # persistent XLA compilation cache: TPU compiles (esp. f64-emulated
    # Newton kernels) are expensive through the remote-compile tunnel; cache
    # them across processes (analogue of the reference's compiledCodeCache,
    # driver/Py4JQueryDriver.scala:49)
    try:
        import jax
        cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                   os.path.expanduser('~/.cache/hail_tpu_xla'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass
    if backend in ('local', 'spark'):
        b: Backend = LocalBackend(n_threads)
    elif backend == 'multihost':
        from .backend.distributed import MultihostBackend
        b = MultihostBackend()
    else:
        raise ValueError(f'unknown backend {backend!r} (expected local or multihost)')
    tmp = tmp_dir or os.environ.get('TMPDIR', '/tmp')
    Env._hc = HailContext(
        b, log or 'hail_tpu.log', quiet, append, tmp, local_tmpdir or tmp,
        default_reference, global_seed, branching_factor)


def stop() -> None:
    if Env._hc is not None:
        Env._hc.backend.stop()
        Env._hc = None


def default_reference():
    from .genetics.reference_genome import default_reference as dr
    return dr()


def get_reference(name: str):
    from .genetics.reference_genome import ReferenceGenome
    return ReferenceGenome.get(name)


def set_global_seed(seed: int) -> None:
    Env.hc()._seed_counter = seed


def _set_flags(**flags) -> None:
    Env.hc().flags.update({k: v for k, v in flags.items()})


def _get_flags(*names):
    f = Env.hc().flags
    if not names:
        return dict(f)
    return {n: f.get(n) for n in names}


def current_backend() -> Backend:
    return Env.backend()


def tmp_dir() -> str:
    return Env.hc().tmp_dir
