"""Train state and step builders.

The jitted train step is a pure function over (state, batch): forward with
mutable batch stats, masked smooth-L1 loss, Adam update with a piecewise LR
schedule, metric suite computed on device — the TPU-native equivalent of
train_sample/test_sample (/root/reference/train.py:241-358).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.mvsnet import mvsnet_loss
from .metrics import depth_metrics


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            tx=tx,
        )

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(
    lr_schedule, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999
) -> optax.GradientTransformation:
    """Adam matching torch.optim.Adam(lr, betas, weight_decay): the decay
    term is added to the gradient *before* the moment updates
    (/root/reference/train.py:129)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def make_train_step(model) -> Callable:
    """Build a jitted (state, batch) -> (state, aux) train step.

    batch: imgs [B,V,H,W,3], proj_matrices [B,V,4,4], depth_values [B,D],
    depth [B,h,w], mask [B,h,w].
    aux: {'loss', metric suite, 'depth_est'}.
    """

    @jax.jit
    def train_step(state: TrainState, batch: dict):
        # u8 transfer packing (data/pipeline.py::pack_u8_imgs): normalize on
        # device; dtype is static at trace time so the f32 path is untouched
        if batch["imgs"].dtype == jnp.uint8:
            batch = dict(batch, imgs=batch["imgs"].astype(jnp.float32) / 255.0)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"],
                batch["proj_matrices"],
                batch["depth_values"],
                train=True,
                mutable=["batch_stats"],
            )
            depth_key = "refined_depth" if "refined_depth" in outputs else "depth"
            loss = mvsnet_loss(outputs[depth_key], batch["depth"], batch["mask"])
            return loss, (outputs, mutated["batch_stats"])

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        aux = {"loss": loss}
        aux.update(depth_metrics(outputs["depth"], batch["depth"], batch["mask"]))
        aux["depth_est"] = outputs["depth"]
        aux["photometric_confidence"] = outputs["photometric_confidence"]
        if "plan_valid" in outputs:
            # paired Pallas sweep (ops/paired_sweep.py): the kernels do not
            # fall back inside the VJP, so the traced plan validity rides
            # out as a metric; the Trainer accumulates and checks it.
            aux["plan_valid"] = outputs["plan_valid"]
        return new_state, aux

    return train_step


def make_eval_step(model) -> Callable:
    """Jitted (variables, batch) -> aux evaluation step (no grad, running
    BN stats) — the analogue of test_sample (/root/reference/train.py:301)."""

    @jax.jit
    def eval_step(variables: dict, batch: dict):
        if batch["imgs"].dtype == jnp.uint8:
            batch = dict(batch, imgs=batch["imgs"].astype(jnp.float32) / 255.0)
        outputs = model.apply(
            variables,
            batch["imgs"],
            batch["proj_matrices"],
            batch["depth_values"],
            train=False,
        )
        loss = mvsnet_loss(outputs["depth"], batch["depth"], batch["mask"])
        aux = {"loss": loss}
        aux.update(depth_metrics(outputs["depth"], batch["depth"], batch["mask"]))
        aux["depth_est"] = outputs["depth"]
        aux["photometric_confidence"] = outputs["photometric_confidence"]
        return aux

    return eval_step


def make_infer_step(model) -> Callable:
    """Jitted inference-only step: (variables, imgs, proj, depth_values) ->
    {'depth', 'photometric_confidence'}."""

    @jax.jit
    def infer(variables, imgs, proj_matrices, depth_values):
        if imgs.dtype == jnp.uint8:
            # u8 transfer packing: loaders emit exactly-u8/255 images (PIL
            # resizes in the u8 domain), so shipping u8 and normalizing on
            # device is lossless and 4x less host->device bandwidth —
            # measured 3.0 -> 0.96 s per 5-view 864x1152 batch through the
            # remote-TPU tunnel. dtype is static at trace time.
            imgs = imgs.astype(jnp.float32) / 255.0
        return model.apply(variables, imgs, proj_matrices, depth_values, train=False)

    return infer


def make_infer_step_views(model, batch_size: int, nviews: int) -> Callable:
    """Jitted inference step taking per-view DEVICE-RESIDENT images.

    ``imgs_flat`` is a tuple of batch_size*nviews (H, W, 3) u8 arrays that
    already live on device (eval stage A keeps a per-(scan, view) device
    store — each image is used ~nviews times per scan, so uploading it once
    and re-referencing it here cuts host->device image traffic ~nviews x
    through the TPU tunnel). Stacking + u8->f32 normalization happen
    on-device inside the jit.
    """

    @jax.jit
    def infer(variables, imgs_flat, proj_matrices, depth_values):
        imgs = jnp.stack([
            jnp.stack(imgs_flat[b * nviews:(b + 1) * nviews])
            for b in range(batch_size)
        ])
        imgs = imgs.astype(jnp.float32) / 255.0
        return model.apply(variables, imgs, proj_matrices, depth_values, train=False)

    return infer
