"""Orbax checkpointing with reference-compatible resume semantics.

The reference saves ``{'epoch', 'model', 'optimizer'}`` every save_freq
epochs to ``model_{epoch:06d}.ckpt`` and resumes from the newest one in the
logdir (/root/reference/train.py:134-148, 192-197). Here a checkpoint is an
orbax directory ``ckpt_{epoch:06d}`` holding {params, batch_stats,
opt_state, epoch, step}; ``find_latest`` mirrors the resume scan.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^ckpt_(\d+)$")


def checkpoint_path(logdir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(logdir), f"ckpt_{epoch:0>6}")


def save_checkpoint(logdir: str, epoch: int, state, extra: dict | None = None) -> str:
    """Save TrainState (+ optional extra metadata) at an epoch boundary."""
    path = checkpoint_path(logdir, epoch)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def find_latest(logdir: str) -> str | None:
    """Newest ckpt_* directory in logdir (by epoch), or None."""
    if not os.path.isdir(logdir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(logdir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(logdir, name)
    return os.path.abspath(best) if best else None


def restore_checkpoint(path: str, state) -> tuple[Any, int]:
    """Restore into an existing TrainState template -> (state, next_epoch)."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
    )
    return new_state, int(restored["epoch"]) + 1


def _abstract_template(path: str):
    """Build a device-agnostic ShapeDtypeStruct tree from checkpoint
    metadata. Restoring against it ignores the shardings recorded at save
    time, so a checkpoint written on CPU loads in a TPU process (and vice
    versa) — plain restore fails with 'Device TFRT_CPU_0 was not found'."""
    import jax

    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(os.path.abspath(path))
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_sds(leaf):
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return jax.ShapeDtypeStruct(tuple(leaf.shape), leaf.dtype, sharding=sharding)
        return leaf

    return jax.tree.map(to_sds, tree)


def restore_variables(path: str, variables_template: dict | None = None) -> dict:
    """Restore only {'params','batch_stats'} (for eval --loadckpt),
    device-agnostically."""
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path), _abstract_template(path))
    return {"params": payload["params"], "batch_stats": payload["batch_stats"]}
