"""Softmax depth regression and photometric confidence.

XLA reference implementations; the fused single-pass Pallas TPU kernel lives
in ops/pallas/softmax_regression.py and is dispatched by
``regress_depth_and_confidence(..., use_pallas=True)``.

Semantics match the reference exactly:
 - depth = sum_d softmax(cost)[d] * depth_values[d]
   (/root/reference/models/module.py:142-147, mvsnet.py:193-204)
 - confidence = (4-tap sliding window sum of the prob volume along depth,
   padding 1 front / 2 back) gathered at the *truncated* expected depth
   index (/root/reference/models/mvsnet.py:214-218; the reference computes
   the window sum as 4 * avg_pool3d with count_include_pad=True, i.e. a
   plain windowed sum over zero-padded depth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_regression(prob_volume: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Expectation over depth hypotheses.

    prob_volume: [B, D, H, W]; depth_values: [B, D] -> depth [B, H, W].
    """
    return jnp.einsum("bdhw,bd->bhw", prob_volume, depth_values)


def _window4_sum_depth(prob_volume: jnp.ndarray) -> jnp.ndarray:
    """Sliding-window sum of 4 along the depth axis with (1, 2) zero padding.

    Equivalent to the reference's ``4 * avg_pool3d(pad(p, (1,2) on D),
    (4,1,1))`` (/root/reference/models/mvsnet.py:216). Implemented as four
    shifted slices of the zero-padded volume — XLA fuses the adds, and the
    formulation is trivially differentiable (lax.reduce_window with a
    custom monoid is not)."""
    padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
    D = prob_volume.shape[1]
    return (
        padded[:, 0:D]
        + padded[:, 1 : D + 1]
        + padded[:, 2 : D + 2]
        + padded[:, 3 : D + 3]
    )


def photometric_confidence(prob_volume: jnp.ndarray) -> jnp.ndarray:
    """Probability mass in a 4-plane window around the regressed depth index.

    prob_volume: [B, D, H, W] -> confidence [B, H, W].
    """
    B, D, H, W = prob_volume.shape
    prob_sum4 = _window4_sum_depth(prob_volume)
    indices = jnp.arange(D, dtype=prob_volume.dtype)
    # Truncation (towards zero) matches torch ``.long()``; the expectation of
    # a non-negative index is non-negative, so trunc == floor here.
    depth_index = jnp.einsum("bdhw,d->bhw", prob_volume, indices).astype(jnp.int32)
    depth_index = jnp.clip(depth_index, 0, D - 1)
    return jnp.take_along_axis(prob_sum4, depth_index[:, None], axis=1)[:, 0]


def regress_depth_and_confidence(
    cost_reg: jnp.ndarray,
    depth_values: jnp.ndarray,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax over depth, expectation depth, and photometric confidence in
    one call (the tail of MVSNet.forward,
    /root/reference/models/mvsnet.py:192-218).

    cost_reg: [B, D, H, W] regularized cost (pre-softmax logits);
    depth_values: [B, D].

    Returns (depth [B, H, W], confidence [B, H, W]).
    """
    if use_pallas:
        from .pallas.softmax_regression import fused_softmax_regression

        return fused_softmax_regression(cost_reg, depth_values)

    prob_volume = jax.nn.softmax(cost_reg, axis=1)
    depth = depth_regression(prob_volume, depth_values)
    # Confidence is a diagnostic, computed under no_grad in the reference
    # (/root/reference/models/mvsnet.py:214).
    confidence = photometric_confidence(jax.lax.stop_gradient(prob_volume))
    return depth, confidence
