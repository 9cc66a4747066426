"""Two-stage pipeline parallelism for stacked G1->G2 inference.

The system's identity is a two-stage pipeline by construction:
G1 detects the shadow matte, G2 removes the shadow given it
(reference src/cgan.py:436-438 runs them back-to-back on one device,
so every GPU holds BOTH generators). Here the stages split across two
device groups: G1's weights live only on the first half of the mesh,
G2's only on the second, and batches flow A -> B with the matte
handed over between stages. JAX's async dispatch overlaps the stages
automatically — while stage B removes shadows from batch *i*, the host
has already dispatched batch *i+1*'s detection on stage A — so steady-
state throughput is set by the slower stage, not the sum, while each
device holds HALF the weight bytes of the replicated layout. Within a
stage, batches still shard on the data axis (data parallelism composes
with the pipeline).

Use :class:`StackedPipeline` as a drop-in for the fused
``make_infer_step`` closure when device count >= 2 and weight memory
(or per-stage batching) matters; the fused single-dispatch path
remains the latency-optimal choice for one chip.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadow_removal_istd_tpu.parallel.mesh import DATA_AXIS


class StackedPipeline:
    """G1 on one device group, G2 on the other, microbatches flowing
    through. ``__call__`` matches ``make_infer_step``'s
    ``(x) -> (m_pred, y_pred)`` contract (params are bound at
    construction); ``stream`` pipelines an iterator of batches with a
    bounded number in flight.
    """

    def __init__(self, models, g_params, batch_stats,
                 devices: Sequence[Any] | None = None, depth: int = 2):
        if devices is None:
            devices = jax.devices()
        assert len(devices) >= 2, "pipeline needs >= 2 devices"
        half = len(devices) // 2
        if len(devices) % 2:
            import logging
            logging.getLogger(__name__).warning(
                "pipeline splits devices into two equal stage groups; "
                "odd device %s stays idle", devices[-1])
        self.mesh_a = Mesh(np.asarray(devices[:half]), (DATA_AXIS,))
        self.mesh_b = Mesh(np.asarray(devices[half:2 * half]),
                           (DATA_AXIS,))
        rep_a = NamedSharding(self.mesh_a, P())
        rep_b = NamedSharding(self.mesh_b, P())
        # each stage's weights exist ONLY on its own device group
        self.v1 = jax.device_put(
            {"params": g_params["g1"], "stats": batch_stats["g1"]}, rep_a)
        self.v2 = jax.device_put(
            {"params": g_params["g2"], "stats": batch_stats["g2"]}, rep_b)
        self.depth = depth

        from shadow_removal_istd_tpu.engine.steps import _apply

        def f1(v, x):
            return _apply(models.g1, v["params"], v["stats"], x,
                          train=False)[0]

        def f2(v, xm):
            return _apply(models.g2, v["params"], v["stats"], xm,
                          train=False)[0]

        self._f1 = jax.jit(f1)
        self._f2 = jax.jit(f2)

    def _batch_sharding(self, mesh: Mesh, n: int) -> NamedSharding:
        # shard the batch within the stage when it divides evenly;
        # replicate otherwise (tiny/ragged final batches)
        if n % mesh.size == 0 and n >= mesh.size:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    def __call__(self, x):
        n = x.shape[0]
        x_a = jax.device_put(x, self._batch_sharding(self.mesh_a, n))
        m = self._f1(self.v1, x_a)
        s_b = self._batch_sharding(self.mesh_b, n)
        # stage handover: x and the matte cross to group B (ICI copy,
        # async like everything else under dispatch)
        x_b = jax.device_put(x_a, s_b)
        m_b = jax.device_put(m, s_b)
        y = self._f2(self.v2, jnp.concatenate([x_b, m_b], axis=-1))
        return m, y

    def stream(self, batches: Iterable[Any],
               ) -> Iterator[tuple[jax.Array, jax.Array]]:
        """Pipeline an iterator of image batches. Keeps up to ``depth``
        batches in flight: the host dispatches ahead, so stage A works
        on batch i+1 while stage B finishes batch i; yielding blocks
        only when the pipeline is full."""
        for m, y in overlap(self, batches, self.depth):
            yield jax.block_until_ready(m), jax.block_until_ready(y)


def overlap(fn, batches: Iterable[Any], depth: int = 2) -> Iterator[Any]:
    """Dispatch-ahead driver: yield ``fn(batch)`` results with up to
    ``depth`` batches in flight, so the consumer's blocking readback of
    result i overlaps the (async-dispatched) device compute of batch
    i+1. The single implementation behind both ``StackedPipeline
    .stream`` and the trainer's fused-infer readback deferral."""
    q: deque = deque()
    for x in batches:
        q.append(fn(x))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()
