"""Mesh construction and sharding helpers (data parallelism over ICI)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def distributed_init(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (pod slices over DCN).

    No-op for single-process runs. The reference has no multi-node path
    at all (SURVEY §2: DataParallel only); this is the TPU-native
    equivalent for scaling past one host.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices: Sequence[Any] | int | None = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices.

    ``devices`` may be a device list, a count (first N devices), or None
    (all devices).
    """
    if devices is None:
        devices = jax.devices()
    elif isinstance(devices, int):
        devices = jax.devices()[:devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a pytree of host arrays onto the mesh, batch-sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def shard_state(mesh: Mesh, state):
    """Replicate a state pytree across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)
