"""Host -> device prefetching.

Double-buffered transfer pipeline: while the device crunches step N, the
host is already shipping batch N+1 (uint8, so 4x less PCIe/ICI traffic
than float32 — normalization happens on device inside the augmentation
kernel). Replaces the reference's DataLoader worker/pin_memory pipeline
(src/cgan.py:126-139).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax

from shadow_removal_istd_tpu.parallel.mesh import batch_sharding


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       mesh=None) -> Iterator:
    """Yield pytrees from ``iterator`` placed on device ahead of use.

    With a mesh, batches are sharded on the data axis; otherwise they go
    to the default device. ``size=2`` keeps one batch in flight.
    """
    queue = collections.deque()
    sharding = batch_sharding(mesh) if mesh is not None else None

    def put(batch):
        if sharding is not None:
            return jax.tree.map(
                lambda a: jax.device_put(a, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
