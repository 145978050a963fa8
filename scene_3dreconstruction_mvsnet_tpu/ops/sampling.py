"""Bilinear image sampling with PyTorch ``F.grid_sample`` semantics, and the
differentiable homography warp built on it.

Parity notes (the <1 mm depth-delta budget lives or dies here):

* The reference warps with ``F.grid_sample(..., mode='bilinear',
  padding_mode='zeros')`` and **default align_corners=False** under
  PyTorch 2.0 (/root/reference/models/module.py:135-136), but builds its
  normalized grid with the align_corners=True convention
  ``x / ((W-1)/2) - 1`` (/root/reference/models/module.py:130-131). The net
  effect is a sampling coordinate ``x * W/(W-1) - 0.5`` in pixel space. We
  reproduce exactly that composition: `warp_src_feature` produces pixel
  coordinates, normalizes them with the reference's formula, and
  `grid_sample_2d` unnormalizes with torch's align_corners=False rule.

* padding_mode='zeros' means each of the 4 bilinear taps that falls outside
  the image contributes 0 while weights are unchanged (no renormalization).

Layouts are channels-last ([B, H, W, C]) so the downstream 3D convolutions
hit the MXU without transposes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.transforms import plane_sweep_coords


def _unnormalize_coord(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map a normalized grid coordinate in [-1, 1] to pixel space, following
    torch.nn.functional.grid_sample."""
    if align_corners:
        return (g + 1.0) * ((size - 1) / 2.0)
    return ((g + 1.0) * size - 1.0) / 2.0


def bilinear_sample_2d(
    img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Sample ``img`` [B, H, W, C] at float pixel coords ``x``/``y`` [B, N]
    with bilinear interpolation and zeros out-of-bounds padding.

    Returns [B, N, C].
    """
    B, H, W, C = img.shape
    dtype = img.dtype

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(dtype)[..., None]
    wy = (y - y0f).astype(dtype)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    flat = img.reshape(B, H * W, C)

    def tap(yi, xi):
        inb = (
            (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        )
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B,N,C]
        return vals * inb[..., None].astype(dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x1)
    v10 = tap(y1, x0)
    v11 = tap(y1, x1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_2d(
    img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """PyTorch-compatible bilinear grid_sample with zeros padding.

    Args:
      img:  [B, H, W, C] (channels-last; torch uses NCHW).
      grid: [B, Hg, Wg, 2] normalized (x, y) in [-1, 1].
      align_corners: torch flag (default False, matching torch>=1.3 default).

    Returns: [B, Hg, Wg, C].
    """
    B, Hg, Wg, _ = grid.shape
    _, H, W, C = img.shape
    gx = grid[..., 0].reshape(B, Hg * Wg)
    gy = grid[..., 1].reshape(B, Hg * Wg)
    x = _unnormalize_coord(gx, W, align_corners)
    y = _unnormalize_coord(gy, H, align_corners)
    out = bilinear_sample_2d(img, x, y)
    return out.reshape(B, Hg, Wg, C)


def warp_src_feature(
    src_fea: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Differentiable homography warp of a source feature map over a sweep of
    fronto-parallel depth planes (TPU equivalent of homo_warping,
    /root/reference/models/module.py:96-139).

    Args:
      src_fea: [B, H, W, C] source-view features.
      src_proj, ref_proj: [B, 4, 4] K@E projection matrices.
      depth_values: [B, D] depth hypotheses.
      align_corners: grid_sample flag; False reproduces the reference's
        PyTorch-2.x behavior (see module docstring).

    Returns: [B, D, H, W, C] warped features, zeros where the plane projects
    outside the source image.

    Note: gradients flow through the sampled feature values only; the sweep
    coordinates are a function of cameras/depth hypotheses, which are inputs
    (the reference computes them under no_grad for the same reason).
    """
    B, H, W, C = src_fea.shape
    D = depth_values.shape[1]

    coords = plane_sweep_coords(src_proj, ref_proj, depth_values, H, W)  # [B,D,HW,2]
    px = coords[..., 0].reshape(B, D * H * W)
    py = coords[..., 1].reshape(B, D * H * W)

    # Reference normalization (align_corners=True convention) ...
    gx = px / ((W - 1) / 2.0) - 1.0
    gy = py / ((H - 1) / 2.0) - 1.0
    # ... undone with the sampler's convention (align_corners flag).
    x = _unnormalize_coord(gx, W, align_corners)
    y = _unnormalize_coord(gy, H, align_corners)

    out = bilinear_sample_2d(src_fea, x, y)  # [B, D*H*W, C]
    return out.reshape(B, D, H, W, C)
