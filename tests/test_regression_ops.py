"""Golden tests of depth regression + confidence vs torch ops, and of the
plane-sweep variance accumulation."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops import (
    depth_regression,
    regress_depth_and_confidence,
    cost_volume_variance,
    warp_src_feature,
)


def _torch_tail(cost_reg, depth_values):
    """Torch oracle for softmax -> regression -> confidence, using the same
    library ops the reference calls (/root/reference/models/mvsnet.py:192-218)."""
    prob = F.softmax(cost_reg, dim=1)  # [B,D,H,W]
    depth = torch.sum(prob * depth_values[..., None, None], 1)
    D = prob.shape[1]
    prob_sum4 = 4 * F.avg_pool3d(
        F.pad(prob.unsqueeze(1), pad=(0, 0, 0, 0, 1, 2)), (4, 1, 1), stride=1, padding=0
    ).squeeze(1)
    idx = torch.sum(prob * torch.arange(D, dtype=torch.float32)[None, :, None, None], 1).long()
    conf = torch.gather(prob_sum4, 1, idx.unsqueeze(1)).squeeze(1)
    return depth, conf


def test_regression_and_confidence_match_torch(rng):
    B, D, H, W = 2, 16, 6, 7
    cost = rng.randn(B, D, H, W).astype(np.float32) * 2.0
    dv = np.linspace(400, 900, D, dtype=np.float32)[None].repeat(B, 0)

    depth, conf = regress_depth_and_confidence(jnp.asarray(cost), jnp.asarray(dv))
    t_depth, t_conf = _torch_tail(torch.from_numpy(cost), torch.from_numpy(dv))

    np.testing.assert_allclose(np.asarray(depth), t_depth.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), t_conf.numpy(), rtol=1e-5, atol=1e-5)


def test_depth_regression_simple():
    """A delta distribution regresses to exactly its hypothesis value."""
    B, D, H, W = 1, 4, 2, 2
    prob = np.zeros((B, D, H, W), np.float32)
    prob[0, 2] = 1.0
    dv = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    out = depth_regression(jnp.asarray(prob), jnp.asarray(dv))
    np.testing.assert_allclose(np.asarray(out), np.full((1, 2, 2), 3.0))


def test_variance_volume_matches_direct(rng):
    """Streamed sum/sumsq accumulation == direct variance over the stacked
    (ref_volume, warped views) — the reference's E[x^2]-E[x]^2
    (/root/reference/models/mvsnet.py:177)."""
    from tests.test_sampling import _random_projection

    B, V, H, W, C, D = 1, 3, 8, 10, 4, 6
    feats = rng.randn(B, V, H, W, C).astype(np.float32)
    projs = np.stack([_random_projection(rng, B)[0] for _ in range(V)])[None]
    dv = np.linspace(30, 50, D, dtype=np.float32)[None]

    var = cost_volume_variance(jnp.asarray(feats), jnp.asarray(projs), jnp.asarray(dv))

    vols = [np.broadcast_to(feats[:, 0][:, None], (B, D, H, W, C))]
    for v in range(1, V):
        w = warp_src_feature(
            jnp.asarray(feats[:, v]),
            jnp.asarray(projs[:, v]),
            jnp.asarray(projs[:, 0]),
            jnp.asarray(dv),
        )
        vols.append(np.asarray(w))
    stack = np.stack(vols)  # [V,B,D,H,W,C]
    direct = (stack**2).mean(0) - stack.mean(0) ** 2

    np.testing.assert_allclose(np.asarray(var), direct, atol=1e-4, rtol=1e-3)


def test_variance_volume_depth_chunking(rng):
    from tests.test_sampling import _random_projection

    B, V, H, W, C, D = 1, 3, 6, 8, 2, 8
    feats = rng.randn(B, V, H, W, C).astype(np.float32)
    projs = np.stack([_random_projection(rng, B)[0] for _ in range(V)])[None]
    dv = np.linspace(30, 50, D, dtype=np.float32)[None]

    full = cost_volume_variance(jnp.asarray(feats), jnp.asarray(projs), jnp.asarray(dv))
    chunked = cost_volume_variance(
        jnp.asarray(feats), jnp.asarray(projs), jnp.asarray(dv), depth_chunk=2
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)
