"""Fused softmax -> depth expectation -> windowed confidence TPU kernel.

Replaces the 4-op XLA tail of MVSNet.forward (softmax over D, expectation,
4-tap window sum, gather-at-index; /root/reference/models/mvsnet.py:192-218)
with a single VMEM-resident pass: the [D, H, W] probability volume never
round-trips to HBM — each (H-tile, W-tile) block streams its D axis through
VMEM once, producing depth and confidence maps directly.

Index gathering is done without a gather: the truncated expected index is
compared against a depth iota to build a one-hot mask, and the windowed sum
is contracted against it (O(D) VPU work per pixel, no dynamic addressing).

The grid tiles (H, W); D stays whole inside the kernel (D <= ~512 fits VMEM
comfortably at the 8x128 tile: D*8*128*4B = 1.6 MB at D=384).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cost_ref, dv_ref, depth_ref, conf_ref):
    """cost_ref: [D, TH, TW]; dv_ref: [D, 1]; outs: [TH, TW]."""
    cost = cost_ref[:].astype(jnp.float32)  # [D, TH, TW]
    D = cost.shape[0]

    # numerically-stable softmax along D
    m = jnp.max(cost, axis=0, keepdims=True)
    e = jnp.exp(cost - m)
    denom = jnp.sum(e, axis=0, keepdims=True)
    prob = e / denom  # [D, TH, TW]

    dv = dv_ref[:].astype(jnp.float32)  # [D, 1]
    depth_ref[:] = jnp.sum(prob * dv[:, :, None], axis=0)

    # windowed sum of 4 along D with (1, 2) zero padding == shifted adds
    zero = jnp.zeros_like(prob[:1])
    pm1 = jnp.concatenate([zero, prob[: D - 1]], axis=0)
    pp1 = jnp.concatenate([prob[1:], zero], axis=0)
    pp2 = jnp.concatenate([prob[2:], zero, zero], axis=0)
    win4 = pm1 + prob + pp1 + pp2  # [D, TH, TW]

    # truncated expected index -> one-hot contraction (no gather)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 0)  # TPU iota is int
    idx = jnp.sum(prob * iota_d.astype(jnp.float32), axis=0)  # [TH, TW]
    idx = jnp.clip(idx, 0.0, D - 1.0).astype(jnp.int32)
    onehot = (iota_d == idx[None]).astype(jnp.float32)
    conf_ref[:] = jnp.sum(win4 * onehot, axis=0)


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "interpret"))
def fused_softmax_regression(
    cost_reg: jnp.ndarray,
    depth_values: jnp.ndarray,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cost_reg: [B, D, H, W] logits; depth_values: [B, D].

    Returns (depth [B, H, W], confidence [B, H, W]), matching
    ops.regression.regress_depth_and_confidence.
    """
    B, D, H, W = cost_reg.shape

    grid = (pl.cdiv(H, tile_h), pl.cdiv(W, tile_w))

    def one(cost, dv):
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (D, tile_h, tile_w),
                    lambda i, j: (0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (D, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ],
            interpret=interpret,
        )(cost, dv[:, None])

    depth, conf = jax.vmap(one)(cost_reg, depth_values)
    return depth, jax.lax.stop_gradient(conf)
