"""Device mesh and sharding helpers.

The reference scales by spawning one OS process per device and wrapping the
model in torch DDP (reference: script.py:129-136, 64-71), with data sharded by
``DistributedSampler`` (data_util.py:172-185). Here all three collapse into a
single-process SPMD program: a 1-D ``Mesh(('data',))`` over every chip, batch
arrays sharded along ``data``, parameters replicated, and XLA inserting the
gradient all-reduce over ICI inside the compiled step.

The mesh is 1-D today because data parallelism is the only strategy the
reference has (SURVEY.md §2.2), but the axis is named so tensor/spatial axes
can be added later without changing call sites.

Multi-host note: on a pod slice (after ``jax.distributed.initialize()``) the
resident pipeline works because every host computes identical deterministic
epoch permutations and holds the full (small) dataset; the host->device
placement of index arrays then shards consistently. Streaming ImageNet on
pods should move to ``jax.make_array_from_process_local_data`` with per-host
file sharding (ROADMAP.md #3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """Build the 1-D data-parallel mesh over the available chips.

    This replaces the reference's ``world_size`` / ``init_process_group``
    rendezvous (script.py:50-56): on a multi-host pod the caller runs
    ``jax.distributed.initialize()`` first and ``jax.devices()`` already spans
    the whole slice.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices but only {len(devices)} "
                f"are visible."
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for arrays whose leading dim is the global batch."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for fully replicated arrays (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = DATA_AXIS):
    """Place a host pytree onto the mesh, sharded along the batch dim."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
