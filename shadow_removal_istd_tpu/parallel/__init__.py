"""Device mesh, GSPMD shardings, and host->device prefetch.

This replaces the reference's single-process ``nn.DataParallel``
(src/cgan.py:78-84) with the TPU-native story: a named
``jax.sharding.Mesh`` over all chips, batches sharded on the "data"
axis, parameters replicated, and XLA inserting the gradient psum and
global-batch BatchNorm collectives over ICI automatically under jit.
Multi-host pods initialize via ``jax.distributed`` (DCN between hosts).
Two further mesh axes the reference cannot express: ``spatial`` (image
H rows sharded for full-resolution forward work) and ``model`` (tensor
parallelism — conv feature channels sharded so weights + optimizer
scale past one chip's HBM).
"""

from shadow_removal_istd_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    distributed_init,
    gather_model_leaves,
    image_sharding,
    make_mesh,
    make_mesh_2d,
    make_mesh_3d,
    make_mesh_tp,
    model_sharding,
    replicated_sharding,
    shard_batch,
    shard_images,
    shard_state,
    train_batch_sharding,
)
from shadow_removal_istd_tpu.parallel.pipeline import (  # noqa: F401
    StackedPipeline,
)
from shadow_removal_istd_tpu.parallel.prefetch import (  # noqa: F401
    prefetch_to_device,
)
