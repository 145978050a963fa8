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

TPU performance: the 4 bilinear taps are fetched with a SINGLE ``lax.gather``
of the 2x2xC footprint from a one-pixel zero-padded copy of the image.
Clamping the footprint origin into the padded frame makes every out-of-range
tap read the zero border, which IS the zeros-padding semantics — no masks,
no per-tap gathers (4x fewer gather rows than the naive formulation, and no
[..., 2] coordinate tensor that would pad 64x into TPU lanes).

Layouts are channels-last ([B, H, W, C]) so the downstream 3D convolutions
hit the MXU without transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry.transforms import plane_sweep_coords


def _unnormalize_coord(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map a normalized grid coordinate in [-1, 1] to pixel space, following
    torch.nn.functional.grid_sample."""
    if align_corners:
        return (g + 1.0) * ((size - 1) / 2.0)
    return ((g + 1.0) * size - 1.0) / 2.0


def _gather_2x2(padded: jnp.ndarray, y0c: jnp.ndarray, x0c: jnp.ndarray) -> jnp.ndarray:
    """Gather the 2x2xC footprint at (y0c, x0c) from a zero-padded image.

    padded: [Hp, Wp, C] (2px zero border, so valid starts are 0..Hp-2);
    y0c/x0c: [N] int32 clamped starts -> [N, 2, 2, C].
    """
    C = padded.shape[-1]
    starts = jnp.stack([y0c, x0c], axis=-1)  # [N, 2]
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return lax.gather(
        padded,
        starts,
        dnums,
        slice_sizes=(2, 2, C),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _bilinear_from_footprint(fp: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray) -> jnp.ndarray:
    """fp: [N, 2, 2, C] (y-major footprint), wx/wy: [N] -> [N, C].

    Interpolates in the footprint dtype: the gathered footprint is 4x the
    output and XLA materializes it, so widening it to f32 on the bf16 fast
    path would double the peak HBM of the whole sweep."""
    wx = wx[:, None].astype(fp.dtype)
    wy = wy[:, None].astype(fp.dtype)
    one = jnp.asarray(1.0, fp.dtype)
    top = fp[:, 0, 0] * (one - wx) + fp[:, 0, 1] * wx
    bot = fp[:, 1, 0] * (one - wx) + fp[:, 1, 1] * wx
    return top * (one - wy) + bot * wy


def bilinear_sample_2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` [B, H, W, C] at float pixel coords ``x``/``y`` [B, N]
    with bilinear interpolation and zeros out-of-bounds padding.

    Returns [B, N, C] in the image dtype (interp weights in f32).
    """
    B, H, W, C = img.shape
    dtype = img.dtype

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f

    # Clamp the footprint origin into the 2px zero-padded frame. Origins in
    # [-1, dim-1] keep their true mixed border/real taps; origins clamped to
    # -2 or dim land entirely in the zero border, so far-out coordinates
    # sample exact zeros — torch's zeros padding with no masking.
    x0c = jnp.clip(x0f, -2.0, float(W)).astype(jnp.int32) + 2
    y0c = jnp.clip(y0f, -2.0, float(H)).astype(jnp.int32) + 2

    padded = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)))

    def per_image(p, yc, xc, wxi, wyi):
        fp = _gather_2x2(p, yc, xc)
        return _bilinear_from_footprint(fp, wxi, wyi)

    out = jax.vmap(per_image)(padded, y0c, x0c, wx, wy)
    return out.astype(dtype)


def bilinear_sample_map(img2d: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample a single-channel [H, W] map at float pixel coords x/y [N] with
    bilinear interpolation and zeros out-of-bounds padding. Returns [N].

    Same border semantics as `bilinear_sample_2d` (footprint origin clamped
    into a 2px zero border), but fetches the 4 taps as flat [N] gathers from
    the flattened padded map instead of a [N, 2, 2, 1] footprint tensor:
    on TPU that trailing (2, 1) shape is tile-padded to (2, 128) — a ~64x
    memory blow-up that OOMs the whole-scan filter at 49 views
    (eval/filtering.py). [N] gathers pad to lanes with no waste.
    """
    H, W = img2d.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0c = jnp.clip(x0f, -2.0, float(W)).astype(jnp.int32) + 2
    y0c = jnp.clip(y0f, -2.0, float(H)).astype(jnp.int32) + 2

    padded = jnp.pad(img2d, ((2, 2), (2, 2)))
    Wp = W + 4
    flat = padded.reshape(-1)
    base = y0c * Wp + x0c
    t00 = jnp.take(flat, base)
    t01 = jnp.take(flat, base + 1)
    t10 = jnp.take(flat, base + Wp)
    t11 = jnp.take(flat, base + Wp + 1)
    top = t00 * (1.0 - wx) + t01 * wx
    bot = t10 * (1.0 - wx) + t11 * wx
    return (top * (1.0 - wy) + bot * wy).astype(img2d.dtype)


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

    px, py = plane_sweep_coords(src_proj, ref_proj, depth_values, H, W)  # [B,D,HW] x2
    px = px.reshape(B, D * H * W)
    py = py.reshape(B, D * H * W)

    # Reference normalization (align_corners=True convention) ...
    gx = px / ((W - 1) / 2.0) - 1.0
    gy = py / ((H - 1) / 2.0) - 1.0
    # ... undone with the sampler's convention (align_corners flag).
    x = _unnormalize_coord(gx, W, align_corners)
    y = _unnormalize_coord(gy, H, align_corners)

    out = bilinear_sample_2d(src_fea, x, y)  # [B, D*H*W, C]
    return out.reshape(B, D, H, W, C)
