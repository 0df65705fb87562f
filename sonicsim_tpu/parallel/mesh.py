"""Device mesh + sharding helpers (the NCCL/DDP replacement).

Reference parallelism (SURVEY.md §2.8): DDP data parallelism via Lightning +
NCCL (separation/train.py:91). TPU-native equivalent: one
``jax.sharding.Mesh`` whose 'data' axis carries batch shards over ICI;
gradients reduce through XLA collectives inserted by jit from sharding
annotations — no explicit allreduce calls.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host pytree with its leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
