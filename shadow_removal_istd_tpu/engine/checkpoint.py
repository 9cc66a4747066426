"""Checkpointing: full train state + per-network weight files.

Two mechanisms, mirroring the reference's semantics
(src/cgan.py:466-523):

1. Per-network weight files ``{G1,G2,D1,D2}_{ClassName}_{best|latest}``
   (flax msgpack instead of torch .pt), loadable individually — the
   ``--load-weights-*`` path.
2. Full training state (step + params + both optimizer states + BN
   stats + BEGAN k's) as a single flax-msgpack file (an orbax
   ``save_checkpoint_orbax``/``load_checkpoint_orbax`` variant exists
   below for users on that stack) — the ``checkpoint.tar``
   equivalent, except the path is configurable (the reference hard-codes
   ``./checkpoint.tar``, src/cgan.py:509) and the decay state restores
   correctly (the reference restores decay_D twice and never decay_G,
   src/cgan.py:521-522 — here the schedule is a pure function of the
   restored step, so there is nothing to desynchronize).
"""

from __future__ import annotations

import os

import jax
from flax import serialization

from shadow_removal_istd_tpu.engine.state import Models, TrainState

_NET_KEYS = {"G1": ("g_params", "g1"), "G2": ("g_params", "g2"),
             "D1": ("d_params", "d1"), "D2": ("d_params", "d2")}


def _net_filename(net: str, models: Models, suffix: str) -> str:
    cls = {"G1": models.g1, "G2": models.g2,
           "D1": models.d1, "D2": models.d2}[net].__class__.__name__
    return f"{net}_{cls}_{suffix}.msgpack"


def save_model_weights(state: TrainState, models: Models, weights_dir: str,
                       suffix: str = "latest") -> list[str]:
    """Write the four per-network weight files (params + batch stats)."""
    os.makedirs(weights_dir, exist_ok=True)
    written = []
    for net, (group, key) in _NET_KEYS.items():
        payload = {
            "params": getattr(state, group)[key],
            "batch_stats": state.batch_stats[key],
        }
        path = os.path.join(weights_dir, _net_filename(net, models, suffix))
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        written.append(path)
    return written


def load_model_weights(state: TrainState, net: str, path: str) -> TrainState:
    """Load one network's weights into the state (``--load-weights-*``)."""
    group, key = _NET_KEYS[net.upper()]
    target = {
        "params": getattr(state, group)[key],
        "batch_stats": state.batch_stats[key],
    }
    with open(path, "rb") as f:
        payload = serialization.from_bytes(target, f.read())
    new_group = dict(getattr(state, group))
    new_group[key] = payload["params"]
    new_stats = dict(state.batch_stats)
    new_stats[key] = payload["batch_stats"]
    return state.replace(**{group: new_group, "batch_stats": new_stats})


def save_checkpoint(state: TrainState, path: str, epoch: int = 0,
                    host: dict | None = None) -> None:
    """Full training state to one file (msgpack; epoch recorded).

    ``host`` carries host-side training state that lives outside the
    device pytree — the plateau-scheduler state dicts and the running
    best validation loss. The reference's checkpoint.tar stores its
    scheduler state dicts the same way (src/cgan.py:490-509) but NOT
    the best loss, so its resumed runs silently reset best-model
    selection; here both survive a resume.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {"epoch": epoch, "state": jax.device_get(state)}
    if host:
        payload["host"] = host
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_checkpoint(state: TrainState,
                    path: str) -> tuple[TrainState, int, dict]:
    """Restore a full training state; returns (state, epoch, host).

    Forward-compatible: fields added to TrainState after a checkpoint
    was written (e.g. ``softadapt``) keep their current values instead
    of failing the restore; checkpoints written before the ``host``
    section existed return an empty host dict.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    target_sd = serialization.to_state_dict(state)
    saved_sd = raw.get("state", {})
    for key, value in target_sd.items():
        saved_sd.setdefault(key, value)
    restored = serialization.from_state_dict(state, saved_sd)
    return restored, int(raw.get("epoch", 0)), dict(raw.get("host") or {})


def make_orbax_checkpointer():
    """One StandardCheckpointer to own for a training run's lifetime.

    Orbax's StandardCheckpointer commits asynchronously: ``save``
    returns once the host has snapshotted the arrays and the epoch
    loop continues while serialization/IO runs in the background —
    the property that makes this the backend of choice for large
    states (the msgpack path blocks the loop for the full write).
    """
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_orbax(state: TrainState, directory: str, step: int,
                          host: dict | None = None, checkpointer=None,
                          wait: bool = False) -> None:
    """Orbax checkpoint (sharded/async path for large runs).

    Layout: ``directory/step_N`` (orbax-managed) plus
    ``directory/meta_step_N.json`` holding the host-side state (epoch
    + best loss + plateau controllers — the same sidecar content the
    msgpack backend embeds). The meta file is written NEXT to the step
    dir, never inside it, so the async commit's atomic rename is
    untouched; its presence does NOT imply the step dir is complete —
    readers must go through orbax (which only sees finalized commits).

    ``wait=False`` (default) returns as soon as orbax has snapshotted
    the state; pass a long-lived ``checkpointer``
    (:func:`make_orbax_checkpointer`) so in-flight saves can be
    awaited at the end of the run.
    """
    import json

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    ckptr = checkpointer or make_orbax_checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    meta = {"epoch": step, "host": host or {}}
    with open(os.path.join(directory, f"meta_step_{step}.json"), "w") as f:
        json.dump(meta, f)
    if wait or checkpointer is None:
        # a throwaway checkpointer would be garbage-collected with the
        # commit still in flight — always drain those
        ckptr.wait_until_finished()


def latest_orbax_step(directory: str) -> int:
    """Largest finalized ``step_N`` in an orbax checkpoint directory."""
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and not name.endswith(".json"):
            full = os.path.join(directory, name)
            # orbax stages under tmp names and renames on commit; only
            # exact step_N dirs are finalized checkpoints
            try:
                steps.append(int(name[len("step_"):]))
            except ValueError:
                continue
            if not os.path.isdir(full):
                steps.pop()
    if not steps:
        raise FileNotFoundError(
            f"no finalized orbax checkpoints under {directory}")
    return max(steps)


def load_checkpoint_orbax(state: TrainState, directory: str,
                          step: int | None = None
                          ) -> tuple[TrainState, int, dict]:
    """Restore (state, epoch, host) from an orbax checkpoint dir.

    ``directory`` may be the backend root (latest step is picked, or
    ``step`` selects one) or a single ``step_N`` dir directly.
    """
    import json

    directory = os.path.abspath(directory)
    base = os.path.basename(directory)
    if base.startswith("step_"):
        step = int(base[len("step_"):])
        directory = os.path.dirname(directory)
    elif step is None:
        step = latest_orbax_step(directory)
    path = os.path.join(directory, f"step_{step}")
    ckptr = make_orbax_checkpointer()
    # the restore target only provides the tree structure and
    # shapes/dtypes — build it from array METADATA, never from device
    # values: device_get of a freshly-initialized (still lazily
    # materializing) state deadlocks on tunneled TPU hosts, and the
    # bytes would be thrown away anyway
    import numpy as np
    target = jax.tree.map(
        lambda a: np.zeros(getattr(a, "shape", ()),
                           getattr(a, "dtype", np.float32)), state)
    restored = ckptr.restore(path, target=target)
    meta_path = os.path.join(directory, f"meta_step_{step}.json")
    host: dict = {}
    epoch = step
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        epoch = int(meta.get("epoch", step))
        host = dict(meta.get("host") or {})
    return restored, epoch, host
