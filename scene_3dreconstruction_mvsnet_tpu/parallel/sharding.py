"""Sharding helpers: replicate parameters, shard batches, build the
multi-chip train step.

Design (SURVEY.md §2c): parameters/optimizer state replicated; the batch is
sharded over 'data'; the cost volume's depth axis is sharded over 'sweep'
via a sharding constraint inside the model (models.MVSNet.volume_sharding).
XLA's GSPMD partitioner inserts the gradient psum over ICI and the halo
exchanges for spatially-sharded convolutions; no hand-written collectives.

BatchNorm note: under GSPMD the batch statistics are computed over the
*global* batch (the mean over a sharded axis lowers to a psum), which is
stronger than the reference's per-replica DataParallel stats.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_BATCH_FIELDS = ("imgs", "proj_matrices", "depth_values", "depth", "mask")


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the batch."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place batch arrays with the batch axis sharded over 'data'. The
    global batch size must be divisible by the data axis size."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k in _BATCH_FIELDS:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def volume_partition_spec() -> P:
    """PartitionSpec for the [B, D, H, W, C] cost volume: batch over 'data',
    depth hypotheses over 'sweep'."""
    return P("data", "sweep")


def volume_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, volume_partition_spec())


def make_sharded_infer(model, mesh: Mesh, variables: dict):
    """Multi-device EVAL stage A: params replicated, the view/batch axis
    sharded over 'data' — each device runs the MVSNet forward on its share
    of the reference views. The TPU answer to the reference's eval-time
    DataParallel (/root/reference/eval.py:309), expressed purely through
    input placements: the jitted infer step is unchanged and GSPMD
    partitions it (batch-pointwise program, no cross-view collectives).

    Returns ``(variables_replicated, infer, shard_fn)``; callers feed
    batches whose leading axis is a multiple of the 'data' axis size.
    Forces classic GSPMD process-wide, same caveat as
    make_sharded_train_step below.
    """
    import jax as _jax

    _jax.config.update("jax_use_shardy_partitioner", False)

    from ..train.state import make_infer_step

    variables = replicate(variables, mesh)
    infer = make_infer_step(model)
    bs = batch_sharding(mesh)

    def shard_fn(imgs, proj_matrices, depth_values):
        return tuple(
            jax.device_put(x, bs)
            for x in (imgs, proj_matrices, depth_values)
        )

    return variables, infer, shard_fn


def make_sharded_train_step(model, tx, mesh: Mesh, variables: dict):
    """Build (state, train_step, shard_fn) for multi-chip training.

    The returned train_step is the ordinary jitted step — sharding is
    carried by the input placements (params replicated, batch over 'data')
    and the model's internal volume constraint; GSPMD does the rest.

    NOTE — PROCESS-WIDE SIDE EFFECT: this forces the classic GSPMD
    partitioner via ``jax.config.update('jax_use_shardy_partitioner', False)``
    and leaves it set. It cannot be scoped: the partitioner choice binds at
    the train step's first *compile* (the caller's first ``train_step(...)``
    call), which happens after this function returns. Any jit compiled in
    the same process afterwards also uses classic GSPMD. Why: as of jax 0.9
    the default Shardy partitioner MISCOMPILES the backward pass when the
    cost volume carries a two-axis constraint (P('data','sweep')): gradients
    come out wrong by ~60x of their magnitude while the forward matches
    (verified on an 8-device CPU mesh; classic GSPMD agrees with
    single-device to reduction noise).
    tests/test_parallel.py::test_sharded_matches_single_device pins the
    correct behavior — re-evaluate the flag when upgrading jax.
    """
    import jax as _jax

    _jax.config.update("jax_use_shardy_partitioner", False)

    from ..train.state import TrainState, make_train_step

    state = TrainState.create(variables, tx)
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    train_step = make_train_step(model)

    def shard_fn(batch: dict) -> dict:
        return shard_batch(batch, mesh)

    return state, train_step, shard_fn
