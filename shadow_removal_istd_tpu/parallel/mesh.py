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


def is_primary() -> bool:
    """True on the process that owns host-side side effects (writers,
    checkpoints, PNG output) in a multi-host run; always True
    single-process."""
    return jax.process_index() == 0


def put_global(sharding, arr):
    """Place one host array onto a sharding that may span processes.

    Single-process this is ``jax.device_put``. Multi-process, every
    process passes the SAME full (global) host array — the pattern this
    framework uses everywhere, since each process loads the full ISTD
    dataset and computes the same shuffle from the shared seed — and
    the callback materializes only the shards addressable from this
    process. Works for batch-sharded, replicated, and channel-sharded
    specs alike (the callback receives each shard's global index).
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


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
    return jax.tree.map(lambda a: put_global(sharding, a), batch)


def shard_state(mesh: Mesh, state):
    """Place a state pytree onto the mesh.

    On a data(-x-spatial) mesh every leaf replicates (parameters are
    ~12M/net; replication is the right call for data parallelism). On a
    mesh with a ``model`` axis the tensor-parallel rule applies instead
    — see :func:`model_sharding`.
    """
    if MODEL_AXIS in mesh.axis_names:
        placed = jax.tree.map(
            lambda a: put_global(model_sharding(mesh, a), a), state)
        _warn_if_tp_ineffective(mesh, placed)
        return placed
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda a: put_global(sharding, a), state)


def _warn_if_tp_ineffective(mesh: Mesh, placed) -> None:
    """Tensor parallelism degrades to silent replication when channel
    counts don't divide the model-axis size (e.g. --model-shard 3 with
    power-of-two ngf widths): every leaf falls through model_sharding's
    replicate branch and per-chip memory doesn't drop at all. Say so
    instead of letting the user OOM exactly as before."""
    import logging

    total = sharded = 0
    for leaf in jax.tree.leaves(placed):
        n = getattr(leaf, "nbytes", 0)
        total += n
        spec = getattr(getattr(leaf, "sharding", None), "spec", ())
        if any(s == MODEL_AXIS for s in spec):
            sharded += n
    frac = sharded / total if total else 0.0
    if frac < 0.5:
        logging.getLogger(__name__).warning(
            "model axis size %d shards only %.0f%% of state bytes — "
            "channel counts must divide the axis size to shard "
            "(power-of-two --model-shard values fit the ngf-multiple "
            "widths); per-chip memory will barely drop",
            mesh.shape[MODEL_AXIS], 100 * frac)


# --------------------------------------------------------------------------
# Spatial partitioning (SP) — shard the image height across chips.
#
# The model family is fully convolutional (no attention, no sequence dim;
# SURVEY §5), so beyond batch data-parallelism the natural second mesh
# axis is *spatial*: split each image's H rows across devices and let
# XLA's SPMD partitioner insert the conv halo exchanges over ICI. This
# serves the latency-bound regime the reference cannot reach at all —
# a single full-resolution (480x640) image accelerated by N chips —
# where DP only helps throughput. Parameters stay replicated (they are
# ~12M/net; the activations at 480x640 dominate HBM).
# --------------------------------------------------------------------------

SPATIAL_AXIS = "spatial"


def make_mesh_2d(n_data: int, n_spatial: int,
                 devices: Sequence[Any] | None = None,
                 axes: tuple[str, str] = (DATA_AXIS, SPATIAL_AXIS)) -> Mesh:
    """2-D (data x spatial) mesh over the first ``n_data*n_spatial``
    devices. The spatial axis should map to the innermost (ICI-nearest)
    devices: halo exchanges are latency-sensitive, gradient psums are not.
    """
    if devices is None:
        devices = jax.devices()
    n = n_data * n_spatial
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(arr, axes)


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image batches: batch over the data axis (when
    present in the mesh), H rows over the spatial axis (when present).

    Use for FORWARD-ONLY work (inference, validation). For training
    batches use :func:`train_batch_sharding` — see its docstring.
    """
    batch_axis = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    h_axis = SPATIAL_AXIS if SPATIAL_AXIS in mesh.axis_names else None
    return NamedSharding(mesh, P(batch_axis, h_axis))


def train_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for TRAINING batches: batch dim over the data axis only.

    The spatial axis is deliberately NOT used for training. XLA's
    Shardy partitioner (the default in jax 0.9) miscompiles the
    BACKWARD pass of train-mode conv+BatchNorm stacks when the image H
    dim is sharded: parameter gradients come back overcounted by exact
    integer factors (2x/4x, verified empirically on an 8-device CPU
    mesh — forward values and forward-only eval/infer are correct, and
    the legacy GSPMD partitioner computes the same gradients correctly).
    Until upstream is fixed, spatial partitioning is a forward-only
    feature; the guard is regression-tested in
    tests/test_parallel.py::TestSpatialPartitioning.
    """
    batch_axis = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return NamedSharding(mesh, P(batch_axis))


def shard_images(mesh: Mesh, batch):
    """Place a pytree of NHWC host arrays onto the mesh, batch- and
    (if the mesh has a spatial axis) row-sharded."""
    sharding = image_sharding(mesh)
    return jax.tree.map(lambda a: put_global(sharding, a), batch)


# --------------------------------------------------------------------------
# Tensor parallelism (TP) — shard conv feature channels across chips.
#
# The reference's only scale axis is replicated data parallelism
# (nn.DataParallel, src/cgan.py:78-84): every GPU holds every weight.
# On TPU the idiomatic way past that is a ``model`` mesh axis: shard
# each conv kernel's output-channel dim (and every per-channel vector —
# BN scale/bias/stats, biases, and their Adam moments) across the axis
# and let GSPMD propagate: activations become channel-sharded NHWC and
# XLA inserts the all-gathers/reduce-scatters over ICI where a layer
# needs full channels (skip concats, the 1/3-channel heads). HBM per
# chip for weights + optimizer drops ~linearly in the axis size, which
# is what unlocks ngf far past a single chip's memory. Unlike the
# spatial axis (forward-only, see train_batch_sharding), the TP
# backward is exact under the default partitioner: the train step
# matches the single-device step to float tolerance
# (tests/test_parallel.py::TestTensorParallel).
# --------------------------------------------------------------------------

MODEL_AXIS = "model"


def make_mesh_tp(n_data: int, n_model: int,
                 devices: Sequence[Any] | None = None) -> Mesh:
    """2-D (data x model) mesh over the first ``n_data*n_model``
    devices. The model axis should map to the innermost (ICI-nearest)
    devices: per-layer channel all-gathers are latency-sensitive, the
    per-step gradient psum is not."""
    return make_mesh_2d(n_data, n_model, devices,
                        axes=(DATA_AXIS, MODEL_AXIS))


def make_mesh_3d(n_data: int, n_spatial: int, n_model: int,
                 devices: Sequence[Any] | None = None) -> Mesh:
    """3-D (data x spatial x model) mesh: every parallelism axis this
    framework has, composed. Forward-only work (inference, validation)
    shards batch over ``data`` and image H rows over ``spatial``
    (image_sharding), while weights/BN stats/optimizer moments stay
    channel-sharded over ``model`` in HBM (shard_state ->
    model_sharding). Because XLA miscompiles spatially-sharded-input x
    channel-sharded-kernel windowed convs (see gather_model_leaves),
    forward steps on this mesh run with ZeRO-3 semantics: each state
    leaf is all-gathered at use, so compute partitions over
    data x spatial only. The serving configuration this serves: a wide
    (large-ngf) model whose weights + optimizer exceed one chip's HBM,
    run at full resolution latency-bound (at 480x640 the activations,
    which DO stay sharded, dominate HBM anyway). ``model`` is the
    innermost (ICI-nearest) axis: the per-leaf all-gathers are the most
    latency-sensitive collectives, then halo exchanges, then the batch
    axis.

    Training on a 3-D mesh degrades gracefully: train batches are
    data-sharded only (train_batch_sharding — the spatial backward is
    guarded off, see its docstring) while true TP compute still applies
    to the train step (data x model is exact; only the spatial
    composition needs the gather).
    """
    if devices is None:
        devices = jax.devices()
    n = n_data * n_spatial * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(n_data, n_spatial, n_model)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


def gather_model_leaves(mesh: Mesh, tree):
    """Constrain every leaf of ``tree`` to replicated — call INSIDE a
    jitted step whose state is channel-sharded over the ``model`` axis.

    XLA inserts one all-gather per leaf, scheduled near its first use;
    stored buffers stay sharded. This is ZeRO-3 / weight-gathered
    semantics: per-chip HBM for params + optimizer state scales with
    the model axis, while compute sees full channels.

    Why it exists: XLA miscompiles a windowed (kernel > 1x1) conv whose
    INPUT is sharded on a spatial dim while its KERNEL is sharded on
    output channels — max|err| ~20 on a unit-normal 3x3 conv, wrong in
    every output element, under BOTH the Shardy and legacy GSPMD
    partitioners (jax 0.9.0, 8-device CPU mesh; 1x1 convs and matmuls
    are exact, and either sharding alone is exact). Pinned by
    tests/test_parallel.py::TestComposedMesh3D::test_upstream_conv_bug_still_present
    — when that test starts failing, the workaround can be dropped and
    true tensor-parallel compute enabled on composed meshes.
    """
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, rep), tree)


def model_sharding(mesh: Mesh, leaf: Any) -> NamedSharding:
    """Tensor-parallel placement rule for one state leaf.

    Shard the trailing (feature/output-channel) dim over the model axis
    when it divides evenly; replicate everything else (scalars, the
    1/3-channel heads, odd-sized leaves). Conv kernels are HWIO and
    per-channel vectors are (C,), so "trailing dim" is the feature dim
    for every parameter, batch-stat, and Adam-moment leaf alike.
    """
    n = mesh.shape[MODEL_AXIS]
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 1 and shape[-1] % n == 0 and shape[-1] >= n:
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 1) + [MODEL_AXIS])))
    return NamedSharding(mesh, P())
