"""Golden tests of the sampling / warp ops against PyTorch CPU.

torch.nn.functional.grid_sample is the exact op the reference calls
(/root/reference/models/module.py:135); matching it bit-for-bit (within f32
tolerance) is hard requirement #1 of SURVEY.md §7."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops import (
    grid_sample_2d,
    warp_src_feature,
)
from scene_3dreconstruction_mvsnet_tpu.geometry import plane_sweep_coords


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(rng, align_corners):
    B, H, W, C = 2, 9, 13, 4
    img = rng.randn(B, H, W, C).astype(np.float32)
    # grid beyond [-1, 1] to exercise zeros padding
    grid = (rng.rand(B, 5, 7, 2).astype(np.float32) * 3.0) - 1.5

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), align_corners=align_corners)

    t = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(ours), t.numpy(), atol=1e-5, rtol=1e-5)


def _random_projection(rng, batch):
    """Random-ish but well-conditioned K@E projection matrices."""
    projs = []
    for _ in range(batch):
        angle = rng.uniform(-0.2, 0.2, size=3)
        Rx = np.array(
            [[1, 0, 0],
             [0, np.cos(angle[0]), -np.sin(angle[0])],
             [0, np.sin(angle[0]), np.cos(angle[0])]]
        )
        Rz = np.array(
            [[np.cos(angle[2]), -np.sin(angle[2]), 0],
             [np.sin(angle[2]), np.cos(angle[2]), 0],
             [0, 0, 1]]
        )
        R = Rx @ Rz
        t = rng.uniform(-5, 5, size=3)
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = t
        K = np.array([[50.0, 0, 8.0], [0, 50.0, 6.0], [0, 0, 1.0]])
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        projs.append(P.astype(np.float32))
    return np.stack(projs)


def _torch_homo_warp(src_fea_nchw, src_proj, ref_proj, depth_values):
    """Independent torch oracle for the homography warp, written from the
    MVSNet plane-sweep equations (not a copy of the reference's code): for
    relative projection P = src @ ref^-1, grid(x,y,d) = P[:3,:3] @ (x,y,1)*d
    + P[:3,3], perspective divide, normalize to [-1,1] with the (W-1)/2
    convention, then grid_sample with PyTorch-2 defaults."""
    B, C, H, W = src_fea_nchw.shape
    D = depth_values.shape[1]
    P = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot, trans = P[:, :3, :3], P[:, :3, 3:4]

    ys, xs = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    pix = torch.stack([xs.reshape(-1), ys.reshape(-1), torch.ones(H * W)])  # [3,HW]
    cam = rot @ pix  # [B,3,HW]
    pts = cam.unsqueeze(2) * depth_values.view(B, 1, D, 1) + trans.view(B, 3, 1, 1)
    xy = pts[:, :2] / pts[:, 2:3]  # [B,2,D,HW]
    gx = xy[:, 0] / ((W - 1) / 2) - 1
    gy = xy[:, 1] / ((H - 1) / 2) - 1
    grid = torch.stack([gx, gy], dim=3).view(B, D * H, W, 2)
    out = F.grid_sample(src_fea_nchw, grid, mode="bilinear", padding_mode="zeros")
    return out.view(B, C, D, H, W)


def test_warp_matches_torch_oracle(rng):
    B, H, W, C, D = 2, 12, 16, 3, 5
    fea = rng.randn(B, H, W, C).astype(np.float32)
    src_proj = _random_projection(rng, B)
    ref_proj = _random_projection(rng, B)
    depth = np.linspace(40.0, 60.0, D, dtype=np.float32)[None].repeat(B, 0)

    ours = warp_src_feature(
        jnp.asarray(fea), jnp.asarray(src_proj), jnp.asarray(ref_proj), jnp.asarray(depth)
    )  # [B,D,H,W,C]

    ref = _torch_homo_warp(
        torch.from_numpy(fea).permute(0, 3, 1, 2),
        torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj),
        torch.from_numpy(depth),
    )  # [B,C,D,H,W]

    ours_nchw = np.transpose(np.asarray(ours), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_nchw, ref.numpy(), atol=2e-4, rtol=1e-4)


def test_plane_sweep_coords_identity(rng):
    """Warping with src == ref must produce the identity mapping."""
    B, H, W, D = 1, 6, 8, 3
    proj = _random_projection(rng, B)
    depth = np.linspace(10, 20, D, dtype=np.float32)[None]
    cx, cy = plane_sweep_coords(
        jnp.asarray(proj), jnp.asarray(proj), jnp.asarray(depth), H, W
    )
    cx = np.asarray(cx).reshape(B, D, H, W)
    cy = np.asarray(cy).reshape(B, D, H, W)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    for d in range(D):
        np.testing.assert_allclose(cx[0, d], xs, atol=1e-3)
        np.testing.assert_allclose(cy[0, d], ys, atol=1e-3)
