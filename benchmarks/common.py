"""Shared measurement machinery for the benchmark scripts.

One home for the discipline every bench must follow on this hardware
(bench.py module docstring has the full rationale):

- persistent compilation cache (first tunnel compiles run minutes);
- params materialized from ``jax.eval_shape`` only — a real ``init``
  forward costs a cold-cache compile, and fill VALUES don't affect
  timing (bf16 0.01 for float leaves keeps convs on the bf16 path);
- the stacked G1+G2 forward as a ``lax.scan`` over micro-batches inside
  ONE jit call (the axon tunnel adds ~25 ms per dispatch) with a scalar
  ``float(...)`` readback per timed iteration (``block_until_ready``
  does not reliably sync through the tunnel).

bench.py, benchmarks/ab_split_skip.py, benchmarks/latency.py and
benchmarks/run_benchmarks.py all build on these helpers so a
measurement fix lands once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_cache() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/srit_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fill_params_bf16(model, x_shape, dtype=jnp.bfloat16) -> dict:
    """Materialize a model's variables from shapes alone: ``dtype``
    0.01 for float leaves (bf16 default keeps convs on the bf16
    path), zeros for the rest (e.g. int BN counters)."""
    shapes = jax.eval_shape(model.init, {"params": jax.random.key(0)},
                            jnp.zeros(x_shape, jnp.float32))
    return jax.tree.map(
        lambda s: (jnp.full(s.shape, 0.01, dtype)
                   if s.dtype == jnp.float32
                   else jnp.zeros(s.shape, s.dtype)), shapes)


def stub_torchvision(vgg_features=None) -> None:
    """Stub torchvision so the reference's modules import without it
    (the reference's loss module pulls in torchvision's VGG at import).

    With ``vgg_features`` (a torch ``nn.Sequential`` in torchvision's
    ``vgg19_bn().features`` layout), the stub is FUNCTIONAL: the
    reference's ``VisualLoss.__init__`` (src/loss.py:37-43) can call
    ``models.vgg19_bn(...).features[:40]`` and ``transforms.Normalize``
    verbatim, so the VGG-on parity benchmark drives the reference's own
    loss module rather than a reimplementation.
    """
    import types as _types

    import sys as _sys

    for _n in ("torchvision", "torchvision.models",
               "torchvision.transforms"):
        _sys.modules.setdefault(_n, _types.ModuleType(_n))
    tv = _sys.modules["torchvision"]
    tv.models = _sys.modules["torchvision.models"]
    tv.transforms = _sys.modules["torchvision.transforms"]
    if vgg_features is not None:
        import torch

        class _VGGContainer:
            def __init__(self, features):
                self.features = features

        class _Normalize:
            """transforms.Normalize for CHW tensors (the only use the
            reference makes of it, src/loss.py:42-43, per-image via
            torch.unbind so no batch dim here)."""

            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        tv.models.vgg19_bn = (
            lambda pretrained=True, progress=False, **kw:
            _VGGContainer(vgg_features))
        tv.transforms.Normalize = _Normalize


def build_random_vgg19_bn_features(seed: int = 0):
    """A torch ``vgg19_bn().features`` stack (torchvision cfg "E"
    layout through pool4, 40 modules) with RANDOM weights.

    For offline parity the comparison needs SHARED weights, not
    pretrained ones (no torchvision / no egress here). Init is chosen
    for sane feature magnitudes — Kaiming-normal convs (ReLU gain) keep
    activations O(1) through 16 layers where torch's N(0, .05) default
    in the unit tests inflates them to O(100) — so λ5=50 on the feature
    MSE trains stably like the pretrained net does. BN is identity
    (scale 1, running stats (0,1)): frozen-eval BN is an affine map, so
    identity loses no generality for parity purposes.
    """
    import torch

    cfg_e = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M"]
    layers: list = []
    in_ch = 3
    for spec in cfg_e:
        if spec == "M":
            layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, spec, 3, padding=1))
            layers.append(torch.nn.BatchNorm2d(spec))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = spec
    seq = torch.nn.Sequential(*layers)
    assert len(seq) == 40
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in seq.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight,
                                              nonlinearity="relu")
                torch.nn.init.zeros_(m.bias)
            elif isinstance(m, torch.nn.BatchNorm2d):
                torch.nn.init.ones_(m.weight)
                torch.nn.init.zeros_(m.bias)
                torch.nn.init.zeros_(m.running_mean)
                torch.nn.init.ones_(m.running_var)
    return seq


def build_stacked(h: int, w: int, *, batch: int, steps: int,
                  split_skip: bool = True):
    """(scanned, v1, v2, xs) for the stacked G1+G2 inference forward.

    ``scanned(v1, v2, xs)`` runs ``steps`` micro-batches of ``batch``
    images in one dispatch and returns a scalar; time it with
    ``float(scanned(...))`` per iteration.

    ``split_skip=True`` is the shipping serving default since the r5
    hardware A/B (three runs: +4.45%/+4.43% flagship, +4.23% full-res
    — benchmarks/ab_split_skip.py), so bench.py measures the default
    configuration; the A/B script passes both values explicitly.
    """
    from shadow_removal_istd_tpu.models import get_generator

    g1 = get_generator("mnet", in_channels=3, out_channels=1,
                       split_skip=split_skip)
    g2 = get_generator("mnet", in_channels=4, out_channels=3,
                       split_skip=split_skip)
    v1 = fill_params_bf16(g1, (1, h, w, 3))
    v2 = fill_params_bf16(g2, (1, h, w, 4))

    @jax.jit
    def scanned(v1, v2, xs):
        def body(acc, x):
            m = g1.apply(v1, x)
            y = g2.apply(v2, jnp.concatenate([x, m], axis=-1))
            return acc + jnp.sum(y.astype(jnp.float32)), None
        total, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return total

    xs = jax.random.uniform(jax.random.key(1), (steps, batch, h, w, 3),
                            jnp.bfloat16) * 2 - 1
    return scanned, v1, v2, xs
