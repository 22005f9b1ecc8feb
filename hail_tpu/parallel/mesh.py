"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's GridPartitioner/Spark-RDD
block distribution (`is/hail/linalg/GridPartitioner.scala`) and for its
tree-reduce fabric: a 2-D `jax.sharding.Mesh` with NamedSharding —
XLA inserts the SUMMA collectives for sharded matmuls (SURVEY §2.4) and psum
for reductions. Multi-host: the same code runs under `jax.distributed` with a
global mesh spanning processes.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_mesh_cache: Optional[Mesh] = None


def _factor2(n: int) -> Tuple[int, int]:
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def get_mesh(devices=None) -> Mesh:
    """A 2-D ('x', 'y') mesh over all devices (or the given ones)."""
    global _mesh_cache
    if devices is None and _mesh_cache is not None:
        return _mesh_cache
    devs = list(devices) if devices is not None else jax.devices()
    a, b = _factor2(len(devs))
    mesh = Mesh(np.asarray(devs).reshape(a, b), ('x', 'y'))
    if devices is None:
        _mesh_cache = mesh
    return mesh


def reset_mesh() -> None:
    global _mesh_cache
    _mesh_cache = None


def n_devices() -> int:
    return len(jax.devices())


def shard_2d(x, mesh: Optional[Mesh] = None):
    """Shard a 2-D array over the ('x','y') mesh; pads are caller's job."""
    mesh = mesh or get_mesh()
    if math.prod(mesh.devices.shape) == 1:
        return jax.device_put(x)
    sh = NamedSharding(mesh, P('x', 'y'))
    return jax.device_put(x, sh)


def replicate(x, mesh: Optional[Mesh] = None):
    mesh = mesh or get_mesh()
    if math.prod(mesh.devices.shape) == 1:
        return jax.device_put(x)
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_rows(x, mesh: Optional[Mesh] = None):
    """Shard axis 0 over all devices ('x' and 'y' flattened)."""
    mesh = mesh or get_mesh()
    if math.prod(mesh.devices.shape) == 1:
        return jax.device_put(x)
    return jax.device_put(x, NamedSharding(mesh, P(('x', 'y'),)))
