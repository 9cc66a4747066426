"""Torch ↔ flax weight interchange for the model zoo.

Lets users of the reference implementation load checkpoints trained with
it (torch ``state_dict`` .pt files, reference src/cgan.py:472-490 save
format) directly into this framework's flax models — and powers the
live numerical-parity test suite (tests/test_reference_step_parity.py).

The mapping is derived structurally, not by name tables: both frameworks
execute the same computation graph, so enumerating the parameterized
layers **in execution order** on each side yields a 1:1 correspondence.

- torch side: forward hooks record each leaf module (Conv2d,
  ConvTranspose2d, BatchNorm2d, Linear) the first time it fires.
- flax side: a linen method interceptor records each parameterized
  module during an ``eval_shape`` init trace (creation order inside
  ``@nn.compact`` is execution order).

Layout conversions (verified numerically against torch):
- Conv2d weight (O,I,kH,kW)         -> flax Conv kernel (kH,kW,I,O)
- ConvTranspose2d weight (I,O,kH,kW)-> flax ConvTranspose kernel
  (kH,kW,I,O) **with spatial flip** (torch deconv convolves, flax
  cross-correlates)
- BatchNorm2d weight/bias/running_mean/running_var
                                    -> scale/bias + batch_stats mean/var
- Linear weight (O,I)               -> flax Dense kernel (I,O)

Every copied tensor is shape-checked after conversion; a kind or count
mismatch raises instead of silently mis-wiring.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L

__all__ = [
    "flax_variables_to_torch",
    "flax_layer_order",
    "torch_layer_order",
    "torch_to_flax_variables",
    "load_torch_checkpoint",
]


def flax_layer_order(model, *example_args, method_kwargs=None):
    """Parameterized-layer paths of ``model`` in execution order.

    Returns a list of ``(path_tuple, kind)`` where kind is one of
    'conv', 'conv_t', 'bn', 'dense'. Uses an abstract init trace, so no
    FLOPs are spent.
    """
    records: list[tuple[tuple[str, ...], str]] = []
    seen = set()

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__":
            kind = None
            if isinstance(mod, nn.ConvTranspose):
                kind = "conv_t"
            elif isinstance(mod, nn.Conv):
                kind = "conv"
            elif isinstance(mod, L.BatchNorm):
                kind = "bn"
            elif isinstance(mod, nn.Dense):
                kind = "dense"
            if kind is not None and mod.path not in seen:
                seen.add(mod.path)
                records.append((mod.path, kind))
        return next_fn(*args, **kwargs)

    kw = dict(method_kwargs or {})

    def trace():
        with nn.intercept_methods(interceptor):
            return model.init({"params": jax.random.key(0), "dropout":
                               jax.random.key(1)}, *example_args, **kw)

    jax.eval_shape(trace)
    return records


def torch_layer_order(torch_model, *example_args):
    """Leaf parameterized torch modules in execution order.

    Returns ``(modules, kinds)``. The model is run once in eval mode
    under no_grad on the example args (NCHW tensors).
    """
    import torch

    records = []
    seen = set()
    kind_of = {
        torch.nn.Conv2d: "conv",
        torch.nn.ConvTranspose2d: "conv_t",
        torch.nn.BatchNorm2d: "bn",
        torch.nn.Linear: "dense",
    }

    def hook(mod, _inp, _out):
        if id(mod) not in seen:
            seen.add(id(mod))
            records.append(mod)

    handles = [
        m.register_forward_hook(hook)
        for m in torch_model.modules()
        if type(m) in kind_of
    ]
    was_training = torch_model.training
    torch_model.eval()
    with torch.no_grad():
        torch_model(*example_args)
    if was_training:
        torch_model.train()
    for h in handles:
        h.remove()
    return records, [kind_of[type(m)] for m in records]


def _to_numpy(t):
    # .copy() matters: .numpy() SHARES memory with the torch tensor, and
    # jax's CPU backend may alias numpy buffers zero-copy — without the
    # copy, torch's later in-place updates (BN running stats, optimizer
    # steps) would silently mutate the already-converted flax arrays.
    return t.detach().cpu().numpy().copy()


def _convert(mod, kind):
    """torch module -> dict of flax leaf arrays for one layer."""
    out: dict[str, dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    if kind == "conv":
        w = _to_numpy(mod.weight)  # (O, I, kH, kW)
        out["params"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        if mod.bias is not None:
            out["params"]["bias"] = _to_numpy(mod.bias)
    elif kind == "conv_t":
        w = _to_numpy(mod.weight)  # (I, O, kH, kW)
        out["params"]["kernel"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
        if mod.bias is not None:
            out["params"]["bias"] = _to_numpy(mod.bias)
    elif kind == "bn":
        out["params"]["scale"] = _to_numpy(mod.weight)
        out["params"]["bias"] = _to_numpy(mod.bias)
        out["batch_stats"]["mean"] = _to_numpy(mod.running_mean)
        out["batch_stats"]["var"] = _to_numpy(mod.running_var)
    elif kind == "dense":
        w = _to_numpy(mod.weight)  # (O, I)
        out["params"]["kernel"] = np.transpose(w, (1, 0))
        if mod.bias is not None:
            out["params"]["bias"] = _to_numpy(mod.bias)
    else:  # pragma: no cover
        raise ValueError(f"unknown kind {kind}")
    return out


def _set_path(tree: dict, path: tuple[str, ...], leaf_name: str, value):
    node = tree
    for p in path:
        node = node[p]
    old = node[leaf_name]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}/{leaf_name}: "
            f"flax {tuple(old.shape)} vs torch-converted {tuple(value.shape)}")
    # keep float64 torch weights as float64 (x64 parity harnesses);
    # otherwise adopt the flax tree's dtype
    target = value.dtype if value.dtype == np.float64 else old.dtype
    node[leaf_name] = jnp.asarray(value, target)


def torch_to_flax_variables(torch_model, flax_model, *example_args,
                            method_kwargs=None,
                            flax_variables=None) -> dict[str, Any]:
    """Copy all torch weights into a flax variable tree.

    ``example_args`` are flax-side NHWC example inputs (shape is all
    that matters). Returns ``{"params": ..., "batch_stats": ...}``.
    """
    import torch

    f_order = flax_layer_order(flax_model, *example_args,
                               method_kwargs=method_kwargs)
    p = next(torch_model.parameters(), None)
    t_dtype = p.dtype if p is not None else torch.float32
    t_args = [
        torch.zeros(tuple(np.shape(a)), dtype=t_dtype)
        .permute(0, 3, 1, 2)
        for a in example_args
    ]
    t_mods, t_kinds = torch_layer_order(torch_model, *t_args)

    f_kinds = [k for _, k in f_order]
    if f_kinds != t_kinds:
        raise ValueError(
            "layer sequences differ:\n"
            f"  flax : {f_kinds}\n  torch: {t_kinds}")

    if flax_variables is None:
        flax_variables = flax_model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            *example_args, **(method_kwargs or {}))
    variables = jax.tree.map(lambda a: a, dict(flax_variables))
    # unfreeze to plain nested dicts
    variables = jax.tree_util.tree_map(np.asarray, variables)

    for (path, kind), mod in zip(f_order, t_mods):
        conv = _convert(mod, kind)
        for leaf_name, value in conv["params"].items():
            _set_path(variables["params"], path, leaf_name, value)
        for leaf_name, value in conv["batch_stats"].items():
            _set_path(variables["batch_stats"], path, leaf_name, value)

    return jax.tree_util.tree_map(jnp.asarray, variables)


def load_torch_checkpoint(state_dict_path, torch_model, flax_model,
                          *example_args, method_kwargs=None):
    """Load a reference-format torch checkpoint into a flax model.

    ``torch_model`` must be constructed with the matching architecture
    arguments (the reference saves bare ``state_dict`` files per net,
    src/cgan.py:472-490).
    """
    import torch

    state = torch.load(state_dict_path, map_location="cpu",
                       weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    torch_model.load_state_dict(state)
    return torch_to_flax_variables(torch_model, flax_model, *example_args,
                                   method_kwargs=method_kwargs)


def _get_path(tree: dict, path: tuple[str, ...]) -> dict:
    node = tree
    for p in path:
        node = node[p]
    return node


def flax_variables_to_torch(variables, flax_model, torch_model,
                            *example_args, method_kwargs=None):
    """Copy flax variables INTO ``torch_model`` (the exact inverse of
    :func:`torch_to_flax_variables`).

    Lets weights trained in this framework run under the torch
    reference — checkpoint interop in BOTH directions. Same
    execution-order structural mapping and shape checks; layout
    transforms are the inverses of the forward direction (flax conv
    kernel HWIO -> torch OIHW; flax deconv kernel un-flipped back to
    torch's convolving IOHW; BN scale/bias + batch_stats -> torch
    weight/bias/running stats). Modifies ``torch_model`` in place and
    returns it.
    """
    import torch

    f_order = flax_layer_order(flax_model, *example_args,
                               method_kwargs=method_kwargs)
    p = next(torch_model.parameters(), None)
    t_dtype = p.dtype if p is not None else torch.float32
    t_args = [
        torch.zeros(tuple(np.shape(a)), dtype=t_dtype)
        .permute(0, 3, 1, 2)
        for a in example_args
    ]
    t_mods, t_kinds = torch_layer_order(torch_model, *t_args)
    f_kinds = [k for _, k in f_order]
    if f_kinds != t_kinds:
        raise ValueError(
            "layer sequences differ:\n"
            f"  flax : {f_kinds}\n  torch: {t_kinds}")

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def _copy(dst, value):
        value = np.asarray(value)
        if tuple(dst.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch: torch {tuple(dst.shape)} vs "
                f"flax-converted {tuple(value.shape)}")
        # copy=True: jax buffers arrive non-writable, and from_numpy on
        # a read-only array raises a warning about undefined behavior
        dst.copy_(torch.from_numpy(np.array(value, copy=True))
                  .to(dst.dtype))

    with torch.no_grad():
        for (path, kind), mod in zip(f_order, t_mods):
            node = _get_path(params, path)
            if kind == "conv":
                # HWIO -> OIHW
                _copy(mod.weight,
                      np.transpose(np.asarray(node["kernel"]),
                                   (3, 2, 0, 1)))
                if mod.bias is not None:
                    _copy(mod.bias, node["bias"])
            elif kind == "conv_t":
                # inverse of transpose(w,(2,3,0,1))[::-1,::-1]:
                # un-flip spatially, then HWIO -> IOHW
                k = np.asarray(node["kernel"])[::-1, ::-1]
                _copy(mod.weight, np.transpose(k, (2, 3, 0, 1)))
                if mod.bias is not None:
                    _copy(mod.bias, node["bias"])
            elif kind == "bn":
                _copy(mod.weight, node["scale"])
                _copy(mod.bias, node["bias"])
                snode = _get_path(stats, path)
                _copy(mod.running_mean, snode["mean"])
                _copy(mod.running_var, snode["var"])
            elif kind == "dense":
                _copy(mod.weight,
                      np.transpose(np.asarray(node["kernel"]), (1, 0)))
                if mod.bias is not None:
                    _copy(mod.bias, node["bias"])
            else:  # pragma: no cover
                raise ValueError(f"unknown kind {kind}")
    return torch_model
