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


def stack_plans(plans: Sequence):
    """Stack per-device host plans into one pytree with a leading device axis.

    The merged-batch plan arrays (sorted flat ids, encoder neighbor indices)
    have NO batch axis — each plan is one merged index space — so they cannot
    be batch-sharded directly. True data-parallel partitioning instead gives
    every device its OWN sub-plan over its local sub-batch: the loader builds
    one plan per device group and this stacks them ([n_dev, ...] leaves) for
    `shard_stacked` + the shard_map'd train step (train/loop.compile_sharded).
    The reference's DDP does the same thing implicitly: every rank runs
    spconv's index build on its local batch (train.py:57-60).
    """
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *plans)


def shard_stacked(tree, mesh: Mesh, axis_name: str = "data"):
    """Shard a stacked pytree's leading (device) axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
