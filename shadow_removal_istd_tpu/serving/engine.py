"""Serving inference engine: bucketed, jit-cached stacked G1+G2.

The reference has no serving story beyond the offline ``--tasks infer``
batch loop (src/cgan.py:420-464). This engine is the TPU-native online
counterpart, built around XLA's compilation model:

- **Static shape buckets.** Every request size is padded up to a
  bucket (multiples of ``pad_multiple`` per spatial dim, power-of-two
  batch sizes), so the jit cache holds a small, bounded set of
  compiled programs instead of one per odd request shape.
- **One dispatch per batch.** Decode/normalize -> G1 -> concat -> G2
  -> denormalize -> uint8 all run inside a single jitted program; the
  host sends uint8 in and receives uint8 out (minimal transfer, and
  the [-1,1] normalization never leaves the device).
- **bf16 by default.** Params and compute are cast to bfloat16 like
  the flagship benchmark path (bench.py); ``dtype="float32"`` restores
  exact-eval numerics.

Padding uses value 128, i.e. ~0 after the reference's ``(x/255-.5)*2``
normalization — the same mid-gray zero-pad semantics the reference's
pix2pix generator applies to odd sizes internally
(src/models/stcgan_g.py:124-132), off by 0.004 gray levels because the
pad happens pre-normalization on the uint8 grid.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from shadow_removal_istd_tpu.models import get_generator

# Spatial divisibility each generator needs at its default depth
# (models/{mnet,unet,denseunet}.py raise on indivisible sizes; the
# pix2pix 'stcgan' G pads internally but is bucketed anyway to bound
# the jit cache).
_DEFAULT_PAD = {"mnet": 32, "unet": 16, "denseunet": 32, "stcgan": 32}


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class _EngineCore:
    """Shared bucketed-dispatch machinery: pad a same-bucket group to
    a device batch, run the jitted pipeline, crop per-image results.

    Subclasses provide ``bucket_of``, ``max_batch``, ``dtype``, and
    ``_infer(v1, v2, x_u8) -> (matte_u8, shadowless_u8)`` plus the
    ``v1``/``v2`` trees (ArtifactEngine carries no variables and
    ignores them). ``fixed_batch`` (optional) pins the device batch
    (concrete-batch artifacts); ``mesh``/``_batch_sharding`` (optional)
    shard the batch for data-parallel serving.
    """

    mesh = None
    _batch_sharding = None
    fixed_batch: int | None = None
    v1: dict = {}
    v2: dict = {}

    def infer_group(self, imgs: list[np.ndarray]
                    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Run one batched dispatch over same-bucket images.

        ``imgs``: HxWx3 uint8 BGR arrays whose sizes map to ONE bucket
        (the batcher groups by bucket). Returns per image
        ``(matte HxW uint8, shadow_free HxWx3 uint8 BGR)`` cropped back
        to the original size.
        """
        if not imgs:
            return []
        buckets = {self.bucket_of(im.shape[0], im.shape[1])
                   for im in imgs}
        if len(buckets) != 1:
            raise ValueError(f"mixed buckets in one group: {buckets}")
        bh, bw = buckets.pop()
        n = len(imgs)
        if self.fixed_batch is not None:
            if n > self.fixed_batch:
                raise ValueError(
                    f"group of {n} exceeds the artifact's pinned "
                    f"batch {self.fixed_batch}")
            bp = self.fixed_batch
        else:
            bp = min(_next_pow2(n), max(self.max_batch, n))
            if self.mesh is not None:  # equal per-device shards
                nd = self.mesh.size
                bp = math.ceil(bp / nd) * nd
        batch = np.full((bp, bh, bw, 3), 128, np.uint8)
        for i, im in enumerate(imgs):
            batch[i, :im.shape[0], :im.shape[1]] = im
        if self._batch_sharding is not None:
            batch = jax.device_put(batch, self._batch_sharding)
        m_u8, y_u8 = self._infer(self.v1, self.v2, batch)
        m_np = np.asarray(jax.device_get(m_u8))
        y_np = np.asarray(jax.device_get(y_u8))
        return [(m_np[i, :im.shape[0], :im.shape[1], 0],
                 y_np[i, :im.shape[0], :im.shape[1]])
                for i, im in enumerate(imgs)]

    def warmup(self, sizes: list[tuple[int, int]],
               batch_sizes: list[int] | None = None) -> None:
        """Pre-compile the (bucket, batch) grid so first requests don't
        pay XLA compilation (1-5 min per graph through a TPU tunnel)."""
        for h, w in sizes:
            for b in (batch_sizes or [1, self.max_batch]):
                dummy = np.full((h, w, 3), 128, np.uint8)
                self.infer_group([dummy] * b)


class InferenceEngine(_EngineCore):
    """Stacked shadow-removal inference over shape buckets.

    Thread-safety: ``infer_group`` may be called from any single
    thread at a time (the serving batcher funnels all device work
    through one thread); construction and ``load_weights`` are not
    thread-safe.
    """

    def __init__(self, net_g: str = "mnet", *, ngf: int = 64,
                 droprate: float = 0.0, nn_upconv: bool = True,
                 use_selu: bool = False, activation: str = "tanh",
                 dtype: str = "bfloat16", split_skip: bool = True,
                 pad_multiple: int | None = None, max_batch: int = 8,
                 devices: int | None = None, seed: int = 0,
                 calib_images: list[np.ndarray] | None = None):
        if dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"dtype must be float32|bfloat16|int8, got {dtype}")
        if dtype == "int8":
            # the PTQ fold supports the MNet nearest-upsample family
            # (models/quant.py); measured +31% over bf16 on the chip
            # (benchmarks/ab_int8_selective.py) at PSNR > 35 dB vs f32
            if net_g.lower() != "mnet" or not nn_upconv or use_selu:
                raise ValueError(
                    "dtype=int8 supports the MNet nearest-upsample "
                    "configuration (net_g=mnet, nn_upconv, no SELU); "
                    "serve other configurations in bfloat16")
            if devices is not None and devices > 1:
                raise ValueError("dtype=int8 is single-device; combine "
                                 "with --devices via bfloat16 instead")
        self.dtype = dtype
        self.activation = activation
        # int8 holds master weights in f32 (the fold/quantize input)
        jdtype = jnp.bfloat16 if dtype == "bfloat16" else None
        self._calib_u8 = calib_images
        self._int8_fn = None
        g_kw = dict(ngf=ngf, drop_rate=droprate, no_conv_t=nn_upconv,
                    use_selu=use_selu, activation=activation, dtype=jdtype)
        if net_g.lower() == "mnet":
            g_kw["split_skip"] = split_skip
        # G1: shadow image -> matte; G2: image ++ matte -> shadow-free
        # (reference channel wiring, src/cgan.py:35-66)
        self.g1 = get_generator(net_g, in_channels=3, out_channels=1, **g_kw)
        self.g2 = get_generator(net_g, in_channels=4, out_channels=3, **g_kw)
        self.pad_multiple = int(pad_multiple
                                or _DEFAULT_PAD[net_g.lower()])
        self.max_batch = int(max_batch)
        hw = max(self.pad_multiple, 64)
        k1, k2 = jax.random.split(jax.random.key(seed))
        self.v1 = self.g1.init(k1, jnp.zeros((1, hw, hw, 3), jnp.float32))
        self.v2 = self.g2.init(k2, jnp.zeros((1, hw, hw, 4), jnp.float32))
        if dtype == "bfloat16":
            self.v1, self.v2 = jax.tree.map(
                lambda a: (a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a),
                (self.v1, self.v2))
        # Data-parallel serving: batch sharded over a 1-D mesh, params
        # replicated; GSPMD partitions the stacked forward (the same
        # scale-out story as training, parallel/mesh.py).
        self.mesh = None
        self._batch_sharding = None
        if devices is not None and devices > 1:
            from shadow_removal_istd_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
            )
            self.mesh = make_mesh(devices)
            self._batch_sharding = batch_sharding(self.mesh)
            self._place_params()
        self._infer = jax.jit(self._stacked)
        self._maybe_quantize()

    # -- int8 serving ---------------------------------------------------

    def _calib_batches(self):
        """[-1,1] f32 calibration batches for activation-scale search.

        Real images (``calib_images``) give representative ranges;
        without them synthetic noise is used — loudly, because
        underestimated scales clip real activations.
        """
        if self._calib_u8:
            out = []
            for im in self._calib_u8:
                bh, bw = self.bucket_of(im.shape[0], im.shape[1])
                pad = np.full((1, bh, bw, 3), 128, np.uint8)
                pad[0, :im.shape[0], :im.shape[1]] = im
                out.append(jnp.asarray(
                    pad.astype(np.float32) * (2.0 / 255.0) - 1.0))
            return out
        import logging
        logging.getLogger(__name__).warning(
            "int8 serving calibrated on synthetic noise — pass real "
            "images (calib_images / --int8-calib) for representative "
            "activation scales")
        k = jax.random.key(11)
        return [jax.random.uniform(k, (2, 256, 256, 3), jnp.float32)
                * 2 - 1]

    def _maybe_quantize(self) -> None:
        """(Re)build the int8 stacked fn from the CURRENT f32 weights —
        called after every weight swap so hot-reload re-quantizes."""
        if self.dtype != "int8":
            return
        from shadow_removal_istd_tpu.models.quant import (
            calibrate_mnet,
            fold_mnet,
            make_stacked_int8,
            quantize_mnet,
        )
        f1 = fold_mnet(self.v1["params"], self.v1.get("batch_stats", {}))
        f2 = fold_mnet(self.v2["params"], self.v2.get("batch_stats", {}))
        batches = self._calib_batches()
        s1, m1 = calibrate_mnet(f1, batches, activation=self.activation,
                                return_outputs=True)
        g2_in = [jnp.concatenate([x, m], axis=-1)
                 for x, m in zip(batches, m1)]
        s2 = calibrate_mnet(f2, g2_in, activation=self.activation)
        self._int8_fn = make_stacked_int8(
            quantize_mnet(f1, s1), quantize_mnet(f2, s2),
            activation=self.activation)
        # params are baked into the int8 graph: a weight swap builds a
        # new fn and the jit cache naturally re-specializes per bucket
        self._infer = jax.jit(self._stacked_int8)

    def _stacked_int8(self, v1, v2, x_u8):
        del v1, v2  # packs are closed over (baked per quantization)
        x = x_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        m, y = self._int8_fn(x)
        to_u8 = lambda t: (jnp.clip(  # noqa: E731
            t.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
            * 255.0).astype(jnp.uint8)
        return to_u8(m), to_u8(y)

    def _place_params(self) -> None:
        if self.mesh is None:
            return
        from shadow_removal_istd_tpu.parallel.mesh import (
            replicated_sharding,
        )
        rep = replicated_sharding(self.mesh)
        self.v1 = jax.device_put(self.v1, rep)
        self.v2 = jax.device_put(self.v2, rep)

    # -- weights ------------------------------------------------------

    def _load_one(self, variables, path: str):
        target = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        # restore against an f32 template so bf16 serving accepts the
        # f32 msgpack files the trainer writes (engine/checkpoint.py)
        target = jax.tree.map(
            lambda a: (a.astype(jnp.float32)
                       if a.dtype == jnp.bfloat16 else a), target)
        with open(path, "rb") as f:
            payload = serialization.from_bytes(target, f.read())
        if self.dtype == "bfloat16":
            payload = jax.tree.map(
                lambda a: (a.astype(jnp.bfloat16)
                           if a.dtype == np.float32 else a), payload)
        out = dict(variables)
        out["params"] = payload["params"]
        if payload["batch_stats"]:
            out["batch_stats"] = payload["batch_stats"]
        return out

    def load_weights(self, g1_path: str, g2_path: str) -> None:
        """Load the trainer's per-network weight files
        (``G1_*.msgpack`` / ``G2_*.msgpack``, engine/checkpoint.py).
        Atomic: a failure on either file leaves both nets unchanged
        (hot-reload must never half-swap)."""
        v1 = self._load_one(self.v1, g1_path)
        v2 = self._load_one(self.v2, g2_path)
        self.v1, self.v2 = v1, v2
        self._place_params()
        self._maybe_quantize()

    def set_variables(self, v1: dict, v2: dict) -> None:
        """Adopt in-memory variable trees (``{"params", "batch_stats"}``
        per net, e.g. a live TrainState's g_params/batch_stats — the
        ``--tasks serve`` path serves straight from training state with
        no msgpack round-trip). Trees must match this engine's module
        config (net/ngf/upsample mode)."""

        def conv(v):
            out = {"params": v["params"],
                   "batch_stats": v.get("batch_stats") or {}}
            if self.dtype == "bfloat16":
                out = jax.tree.map(
                    lambda a: (a.astype(jnp.bfloat16)
                               if a.dtype == jnp.float32 else a), out)
            if not out["batch_stats"]:
                out.pop("batch_stats")
            return out

        self.v1, self.v2 = conv(v1), conv(v2)
        self._place_params()
        self._maybe_quantize()

    # -- inference ----------------------------------------------------

    def _stacked(self, v1, v2, x_u8):
        # reference normalization: uint8/255 in [0,1], then (x-.5)*2
        # (src/utils.py:60-62, src/dataset.py:149-153)
        x = x_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        m = self.g1.apply(v1, x)
        y = self.g2.apply(v2, jnp.concatenate(
            [x.astype(m.dtype), m], axis=-1))
        to_u8 = lambda t: (jnp.clip(  # noqa: E731
            t.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
            * 255.0).astype(jnp.uint8)
        return to_u8(m), to_u8(y)

    def bucket_of(self, h: int, w: int) -> tuple[int, int]:
        m = self.pad_multiple
        return (math.ceil(h / m) * m, math.ceil(w / m) * m)


class ArtifactEngine(_EngineCore):
    """Serve a StableHLO export artifact (tools/export.py) directly.

    The deployment story with NO model code on the serving host: the
    artifact carries the stacked graph with trained params baked in;
    this engine wraps it with the same uint8-in/uint8-out on-device
    pipeline (normalize fused before ``exported.call``, quantize
    after, all one jitted dispatch) and the same bucket/batcher
    surface as :class:`InferenceEngine`.

    Artifacts are exported at a fixed (H, W) — every request must fit
    inside it (smaller images are mid-gray padded and cropped back);
    a pinned-batch artifact also fixes the device batch.
    """

    def __init__(self, path: str, *, max_batch: int = 8):
        from jax import export as jax_export

        with open(path, "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        (aval,) = self._exported.in_avals
        b, h, w, c = aval.shape
        if c != 3:
            raise ValueError(f"expected NHWC/3 artifact, got {aval}")
        self.height, self.width = int(h), int(w)
        self.fixed_batch = int(b) if isinstance(b, int) else None
        self.max_batch = (self.fixed_batch if self.fixed_batch
                          else int(max_batch))
        self.dtype = str(aval.dtype)
        in_dtype = aval.dtype

        def stacked(v1, v2, x_u8):  # v1/v2 unused: params are baked in
            x = (x_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0)
            m, y = self._exported.call(x.astype(in_dtype))
            to_u8 = lambda t: (jnp.clip(  # noqa: E731
                t.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
                * 255.0).astype(jnp.uint8)
            return to_u8(m), to_u8(y)

        self._infer = jax.jit(stacked)

    def bucket_of(self, h: int, w: int) -> tuple[int, int]:
        if h > self.height or w > self.width:
            raise ValueError(
                f"image {h}x{w} exceeds the artifact's exported "
                f"{self.height}x{self.width}; re-export with a larger "
                "--shape")
        return (self.height, self.width)
