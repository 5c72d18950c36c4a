"""Device mesh + sharding helpers (data parallelism over ICI).

The reference scales with mmengine DDP over NCCL (`--launcher pytorch`,
train.py:57-60, dist_cfg backend='nccl'); the TPU-native equivalent is a
`jax.sharding.Mesh` with the batch dimension sharded over the 'data' axis —
XLA inserts the gradient all-reduce over ICI during jit partitioning, so the
train step needs no explicit collectives (SURVEY.md §2c, §5 'Distributed
communication backend').
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every leaf of a batch pytree along its leading (batch) dim."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
