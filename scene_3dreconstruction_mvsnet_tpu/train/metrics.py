"""Depth-error metric suite (jnp, jit-friendly).

Semantics match /root/reference/utils.py:127-156: each metric is computed
per image over the masked pixels, then averaged over the batch.
``thres{N}mm_error`` is an error *rate* — the fraction of masked pixels with
absolute error above the threshold (higher = worse); the reference name is
kept for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_per_image_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` over mask per image -> [B]."""
    axes = tuple(range(1, values.ndim))
    m = mask.astype(values.dtype)
    total = jnp.sum(values * m, axis=axes)
    count = jnp.maximum(jnp.sum(m, axis=axes), 1.0)
    return total / count


def abs_depth_error(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean absolute depth error, per-image then batch-averaged."""
    err = jnp.abs(depth_est - depth_gt)
    return jnp.mean(_masked_per_image_mean(err, mask))


def threshold_error_rate(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray, thres: float
) -> jnp.ndarray:
    """Fraction of masked pixels with |err| > thres (mm), per-image then
    batch-averaged."""
    err_mask = (jnp.abs(depth_est - depth_gt) > thres).astype(jnp.float32)
    return jnp.mean(_masked_per_image_mean(err_mask, mask))


def depth_metrics(
    depth_est: jnp.ndarray,
    depth_gt: jnp.ndarray,
    mask: jnp.ndarray,
    thresholds: tuple[float, ...] = (1.0, 2.0, 4.0, 8.0),
) -> dict[str, jnp.ndarray]:
    """The reference's 5-metric suite (/root/reference/train.py:258-262)."""
    valid = mask > 0.5
    out = {"abs_depth_error": abs_depth_error(depth_est, depth_gt, valid)}
    for t in thresholds:
        out[f"thres{int(t)}mm_error"] = threshold_error_rate(
            depth_est, depth_gt, valid, t
        )
    return out
