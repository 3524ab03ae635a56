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

Multi-host story (SURVEY.md §5.8): after ``jax.distributed.initialize()``
each process only *addresses* its local chips, so host arrays cannot be
``device_put`` onto the global mesh directly. Two placement helpers cover
the two data planes:

- ``put_global``: every host holds the identical full array (deterministic
  epoch permutations, HBM-resident small datasets, replicated train state);
  each process contributes the shards its own devices need.
- ``put_process_local``: each host holds only *its* contiguous slice of the
  global batch (the streaming pipeline decodes only local rows — hosts never
  redundantly decode the full batch); assembled with
  ``jax.make_array_from_process_local_data``, the DistributedSampler
  replacement.
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
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def put_global(x, sharding: NamedSharding):
    """Place a host-global array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put``. Multi-process: every host holds the
    identical full array (guaranteed by the deterministic samplers/pipelines)
    and contributes only the shards its addressable devices own.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def put_replicated(tree, mesh: Mesh):
    """Replicate a host pytree across the mesh (params, optimizer state)."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def process_local_extent(sharding: NamedSharding, global_shape, axis: int):
    """(start, stop) of the contiguous rows this process's devices own along
    ``axis``. With a 1-D mesh built over ``jax.devices()`` (process-major
    order) each process owns one contiguous block; asserted, not assumed."""
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    spans = []
    for idx in idx_map.values():
        sl = idx[axis]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else global_shape[axis]
        spans.append((start, stop))
    spans.sort()
    lo, hi = spans[0][0], spans[-1][1]
    covered = 0
    for s, t in spans:
        covered += t - s
    if covered != hi - lo:
        raise ValueError(
            f"Process-local shards are not contiguous along axis {axis}: "
            f"{spans}. Build the mesh over jax.devices() order.")
    return lo, hi


def put_process_local(local, sharding: NamedSharding, global_shape):
    """Assemble a global array from this process's local slice (the
    DistributedSampler replacement for multi-host input pipelines)."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local), tuple(global_shape))
