"""Multi-host (multi-process) training skeleton.

The reference launches multi-node DDP through slurm/mpi/pytorch launchers
(reference train.py:56-64 `--launcher`, mmengine init_dist). The TPU-native
equivalent is JAX multi-process: one Python process per host (a TPU pod
slice assigns each host its local chips), `jax.distributed.initialize` for
the coordination service, one GLOBAL mesh over `jax.devices()`, and
process-local data feeding via `jax.make_array_from_process_local_data`.
The DDP step itself (train/loop.compile_sharded) is unchanged — shard_map
over the global mesh; XLA routes the gradient pmean over ICI within a slice
and DCN across slices (SURVEY.md §2b).

Wire-up contract (cli/train.py --multihost):

  * every process calls :func:`init_multihost` BEFORE first device use;
  * every process runs the same loader seed and slices each global batch to
    its own rows (:func:`host_rows`) — the per-host loader offset the
    reference gets from DistributedSampler;
  * batches/plans become global arrays with :func:`globalize` /
    :func:`globalize_stacked_plans`; params/optimizer state with
    :func:`replicate_multihost`.

Single-process behavior is unchanged: process_count() == 1 makes every
helper here a plain device_put equivalent.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> tuple:
    """`jax.distributed.initialize` with env-var fallbacks.

    Falls back to JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (the names the launcher scripts export); on TPU pods all
    three are auto-detected from the TPU metadata and may be omitted
    entirely. Returns (process_index, process_count).
    """
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    nproc = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID"
    )
    if pid is not None:
        kwargs["process_id"] = int(pid)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def host_rows(global_batch_size: int) -> slice:
    """This process's contiguous row block of each global batch.

    Every process runs the identical (seeded) loader over the full dataset
    and keeps only its rows — same sample->rank assignment as the
    reference's DistributedSampler with shuffle sharing a seed.
    """
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def globalize(tree, mesh: Mesh, axis_name: str = "data"):
    """Process-local batch rows -> one global jax.Array sharded over `mesh`.

    Each process passes ONLY its local rows (host_rows of the global batch);
    the result is the [B_global, ...] array the sharded train step consumes.
    Works single-process too (then it equals shard_batch).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def globalize_stacked_plans(local_plans: Sequence, mesh: Mesh,
                            axis_name: str = "data"):
    """Per-LOCAL-device sub-plans -> global stacked plan over all hosts.

    `local_plans`: one host-built plan per addressable device of this
    process (len == jax.local_device_count()). Leaves become global
    [n_global_devices, ...] arrays sharded one-slot-per-device, matching
    what train/loop.compile_sharded expects.
    """
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *local_plans
    )
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), stacked
    )


def replicate_multihost(tree, mesh: Mesh):
    """Fully replicate params/optimizer state across a multi-host mesh.

    Every process holds the same host values (same init seed / restored
    checkpoint), so the fully-replicated global array is assembled from
    identical process-local copies.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
