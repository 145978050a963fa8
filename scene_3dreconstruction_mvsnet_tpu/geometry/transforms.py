"""Projective geometry primitives (jnp, batched, jit-friendly).

These are the TPU-native equivalents of the scattered numpy/torch camera
algebra in the reference:
  - projection matrix composition K@E            (/root/reference/datasets/dtu_yao.py:104-105)
  - 4x4 inverse for relative projections          (/root/reference/models/module.py:107)
  - pixel grids (corner- and center-convention)   (/root/reference/eval.py:267-276)
  - depth map -> world points back-projection     (/root/reference/eval.py:253-265)
  - plane-sweep source-view sampling coordinates  (/root/reference/models/module.py:106-133)

Everything is float32 and shape-static so it fuses under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Camera algebra is tiny (3x3 / 4x4 matmuls) but feeds sampling coordinates;
# sub-pixel errors blow the <1 mm parity budget. Always run it in full f32
# on the MXU rather than the TPU's default bf16 passes.
_EXACT = lax.Precision.HIGHEST


def compose_projection_matrix(intrinsics: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """proj = [[K @ E[:3,:4]], [E[3,:4]]] for K [...,3,3], E [...,4,4] -> [...,4,4]."""
    top = jnp.einsum(
        "...ij,...jk->...ik", intrinsics, extrinsics[..., :3, :4], precision=_EXACT
    )
    return jnp.concatenate([top, extrinsics[..., 3:4, :4]], axis=-2)


def invert_rigid(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid-body [...,4,4] (R|t) matrix exactly: inv = (R^T | -R^T t)."""
    R = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.matmul(Rt, t, precision=_EXACT)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=extrinsics.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_4x4(mat: jnp.ndarray) -> jnp.ndarray:
    """General batched 4x4 inverse (projection matrices K@E are not rigid)."""
    return jnp.linalg.inv(mat)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid with integer-corner convention -> [3, H*W]
    rows (x, y, 1). Matches torch.meshgrid usage in the reference warp
    (/root/reference/models/module.py:119-123)."""
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    ones = jnp.ones((height * width,), dtype=dtype)
    return jnp.stack([x.reshape(-1), y.reshape(-1), ones], axis=0)


def pixel_grid_centered(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid with half-pixel-center convention -> [3, H*W].

    Matches get_pixel_grids_np (/root/reference/eval.py:267-276): linspace
    from 0.5 to dim-0.5. Used by back-projection to world points.
    """
    x = jnp.linspace(0.5, width - 0.5, width, dtype=dtype)
    y = jnp.linspace(0.5, height - 0.5, height, dtype=dtype)
    xc, yc = jnp.meshgrid(x, y, indexing="xy")
    ones = jnp.ones((height * width,), dtype=dtype)
    return jnp.stack([xc.reshape(-1), yc.reshape(-1), ones], axis=0)


def depth_to_world_points(
    depth_map: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    xy_scale: float = 1.0531,
) -> jnp.ndarray:
    """Back-project a depth map [H,W] to world points [H*W, 3].

    Matches depth2pts_np (/root/reference/eval.py:253-265) including the
    empirical 1.0531 scale the reference applies to world x/y (set
    ``xy_scale=1.0`` for unscaled geometry).
    """
    h, w = depth_map.shape
    grid = pixel_grid_centered(h, w, dtype=depth_map.dtype)  # [3, HW]
    uv = jnp.matmul(jnp.linalg.inv(intrinsics), grid, precision=_EXACT)
    cam_points = uv * depth_map.reshape(1, -1)
    R = extrinsics[:3, :3]
    t = extrinsics[:3, 3:4]
    world = jnp.matmul(
        jnp.linalg.inv(R), cam_points - t, precision=_EXACT
    ).T  # [HW, 3]
    return world.at[:, :2].multiply(xy_scale) if xy_scale != 1.0 else world


def project_points(
    xyz_world_h: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project homogeneous world points [4, N] into a camera ->
    (xy pixel coords [2, N], camera-frame depth [N])."""
    cam = jnp.matmul(extrinsics, xyz_world_h, precision=_EXACT)[:3]
    K_xyz = jnp.matmul(intrinsics, cam, precision=_EXACT)
    xy = K_xyz[:2] / K_xyz[2:3]
    return xy, cam[2]


def plane_sweep_coords(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Source-view pixel coordinates for every (depth plane, ref pixel).

    For relative projection P = src_proj @ inv(ref_proj), a ref pixel (x, y)
    at hypothesis depth d maps to src homogeneous coords
    ``R[:, :2] @ (x, y) * d + R[:, 2] * d + t`` — implemented as one matmul
    over the pixel grid, then scaled per depth plane and perspective-divided.
    Mirrors the no-grad grid build of homo_warping
    (/root/reference/models/module.py:106-133) but returns *pixel* coords
    (normalization to sampler space is the sampler's concern).

    Args:
      src_proj: [B, 4, 4] source K@E.
      ref_proj: [B, 4, 4] reference K@E.
      depth_values: [B, D] depth hypotheses.
      height, width: reference feature map size (static).

    Returns:
      (x, y): two [B, D, H*W] float32 source pixel coordinate arrays.
      (Returned separately — a trailing xy axis of size 2 would be padded
      64x into TPU lanes when materialized.)
    """
    dtype = depth_values.dtype
    proj = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=_EXACT)  # [B,4,4]
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]  # [B,3,1]

    xyz = pixel_grid(height, width, dtype=dtype)  # [3, HW]
    rot_xyz = jnp.matmul(rot, xyz, precision=_EXACT)  # [B,3,HW]
    # per-component [B,D,HW]: rot_xyz broadcast over depth planes + trans
    def comp(i):
        return (
            rot_xyz[:, i, None, :] * depth_values[:, :, None]
            + trans[:, i, None, :]
        )

    z = comp(2)
    x = comp(0) / z
    y = comp(1) / z
    return x, y
