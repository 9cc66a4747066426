"""Serving export: serialize the stacked G1+G2 inference graph.

The reference's only deployment artifact is a pickled ``state_dict``
that needs the full Python model zoo to run (torch.save at
src/cgan.py:466-488). The TPU-native serving story is a **serialized
StableHLO artifact** (``jax.export``): the trained parameters are baked
into the graph as constants, so the file is self-contained — loading it
needs jax but NOT this package's model code — and it stays loadable by
newer jax releases within the jax.export backward-compatibility window
(newer jax loads older artifacts; the guarantee is bounded, not
open-ended). Multi-platform lowering (``platforms=("tpu", "cpu")``)
makes one artifact servable on TPU workers and CPU fallback hosts
alike.

Typical flow::

    # after training
    export_stacked_inference("model.shlo", trainer.state,
                             trainer.models, image_shape=(480, 640))
    # on the serving host (no shadow_removal_istd_tpu needed)
    run = load_exported("model.shlo")
    matte, shadow_free = run(batch_nhwc_in_minus1_1)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _stacked_fn(models, g_params, batch_stats):
    """Closure: x (N, H, W, 3) in [-1,1] -> (matte, shadow-free)."""

    def fn(x):
        m = models.g1.apply(
            {"params": g_params["g1"], "batch_stats": batch_stats["g1"]},
            x, train=False)
        y = models.g2.apply(
            {"params": g_params["g2"], "batch_stats": batch_stats["g2"]},
            jnp.concatenate([x, m], axis=-1), train=False)
        return m, y

    return fn


def export_stacked_inference(path: str, state, models,
                             image_shape: tuple[int, int] = (480, 640),
                             batch_size: int | None = None,
                             dtype=jnp.float32,
                             platforms: tuple[str, ...] = ("tpu", "cpu")):
    """Serialize the stacked inference graph with params baked in.

    ``batch_size=None`` exports with a symbolic batch dimension (any
    batch at serving time, one artifact); a concrete int pins it.
    Returns the number of bytes written.
    """
    params = jax.device_get(state.g_params)
    stats = jax.device_get(state.batch_stats)
    fn = _stacked_fn(models, params, stats)
    h, w = image_shape
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, h, w, 3), dtype)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), dtype)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        spec)
    blob = exported.serialize()
    # atomic publish: a crash mid-write must not leave a truncated
    # artifact at the serving path
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


def load_exported(path: str):
    """Load a serialized artifact -> callable(x) -> (matte, shadow_free).

    Needs jax only — the model zoo is baked into the StableHLO.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def run(x):
        return exported.call(x)

    return run


def main(argv=None):
    """Standalone export CLI: checkpoint -> serving artifact.

    python -m shadow_removal_istd_tpu.tools.export \\
        --load-checkpoint w/checkpoint.msgpack --out model.shlo \\
        [--shape 480 640] [--batch N] [--ngf 64] [--net-G mnet] ...
    """
    import argparse

    from shadow_removal_istd_tpu.cli.main import _sync_platform_env
    _sync_platform_env()  # honor JAX_PLATFORMS under pre-imported jax
    from shadow_removal_istd_tpu.engine import (
        TrainConfig,
        build_models,
        init_state,
    )
    from shadow_removal_istd_tpu.engine.checkpoint import load_checkpoint

    parser = argparse.ArgumentParser(
        description="serialize a trained checkpoint as a self-contained "
                    "StableHLO serving artifact")
    parser.add_argument("--load-checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--shape", type=int, nargs=2, default=[480, 640],
                        metavar=("H", "W"))
    parser.add_argument("--batch", type=int, default=None,
                        help="pin the batch (default: symbolic — any "
                             "batch at serving time)")
    parser.add_argument("--net-G", default="mnet")
    parser.add_argument("--ngf", type=int, default=64)
    parser.add_argument("--NN-upconv", action="store_true")
    parser.add_argument("--activation", default="tanh")
    parser.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    args = parser.parse_args(argv)

    cfg = TrainConfig(net_g=args.net_G, ngf=args.ngf,
                      nn_upconv=args.NN_upconv, activation=args.activation,
                      use_visual_loss=False, droprate=0.0)
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models, image_size=32)
    state, _, _ = load_checkpoint(state, args.load_checkpoint)
    nbytes = export_stacked_inference(
        args.out, state, models, image_shape=tuple(args.shape),
        batch_size=args.batch, platforms=tuple(args.platforms))
    print(f"wrote {args.out} ({nbytes / 1e6:.1f} MB, "
          f"platforms={args.platforms})")


if __name__ == "__main__":
    main()
