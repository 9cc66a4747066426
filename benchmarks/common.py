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


def stub_torchvision() -> None:
    """Stub torchvision so the reference's modules import without it
    (the reference's loss module pulls in torchvision's VGG at import;
    none of the comparison benches need it)."""
    import types as _types

    import sys as _sys

    for _n in ("torchvision", "torchvision.models",
               "torchvision.transforms"):
        _sys.modules.setdefault(_n, _types.ModuleType(_n))
    _sys.modules["torchvision"].models = _sys.modules["torchvision.models"]
    _sys.modules["torchvision"].transforms = (
        _sys.modules["torchvision.transforms"])


def build_stacked(h: int, w: int, *, batch: int, steps: int,
                  split_skip: bool = False):
    """(scanned, v1, v2, xs) for the stacked G1+G2 inference forward.

    ``scanned(v1, v2, xs)`` runs ``steps`` micro-batches of ``batch``
    images in one dispatch and returns a scalar; time it with
    ``float(scanned(...))`` per iteration.
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
