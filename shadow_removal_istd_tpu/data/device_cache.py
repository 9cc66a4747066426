"""Device-resident dataset cache.

ISTD is small (~2.7 GB uint8 for all training streams), so the whole
dataset fits in one TPU's HBM. This cache keeps every stream on device
as stacked uint8 arrays; each step gathers its shuffled batch with a
single on-device ``take`` and feeds the fused augmentation kernel —
zero host involvement per step, no PCIe transfers in the hot loop.

This is the TPU-native answer to the reference's multi-worker
DataLoader (src/cgan.py:126-139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDatasetCache:
    """Holds stacked streams in HBM; serves index-gathered batches."""

    def __init__(self, streams: dict[str, np.ndarray], sharding=None):
        self.names = tuple(sorted(streams))
        if sharding is not None:
            # put_global handles multi-host meshes: every process holds
            # the same full dataset and contributes its local shards
            from shadow_removal_istd_tpu.parallel.mesh import put_global
            put = lambda a: put_global(sharding, a)  # noqa: E731
        else:
            put = jax.device_put
        # Dataset arrays are replicated (or default-placed); batches are
        # gathered on device.
        self._arrays = tuple(put(streams[k]) for k in self.names)
        self.n = int(self._arrays[0].shape[0])

    def gather(self, indices: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        """Batch-gather all streams by index (on device)."""
        return tuple(jnp.take(a, indices, axis=0) for a in self._arrays)

    def epoch_indices(self, key: jax.Array, batch_size: int,
                      drop_last: bool = True) -> jnp.ndarray:
        """Shuffled (steps, batch) index matrix for one epoch.

        drop_last=False keeps every sample by wrapping the permutation
        around to fill the ragged final batch (static shapes under jit
        rule out a short batch)."""
        perm = jax.random.permutation(key, self.n)
        if drop_last:
            steps = self.n // batch_size
            return perm[: steps * batch_size].reshape(steps, batch_size)
        steps = -(-self.n // batch_size)
        pad = steps * batch_size - self.n
        full = jnp.concatenate([perm, perm[:pad]]) if pad else perm
        return full.reshape(steps, batch_size)
