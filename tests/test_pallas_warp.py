"""Plane-sweep warp Pallas kernel tests (interpret mode; real-TPU
correctness was verified manually — see kernel docstring)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops.pallas.plane_sweep_warp import (
    plan_windows,
    warp_src_feature_pallas,
)
from scene_3dreconstruction_mvsnet_tpu.ops.sampling import warp_src_feature


def _proj(K, tx=0.0, ty=0.0, rot_deg=0.0):
    a = np.deg2rad(rot_deg)
    R = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float32,
    )
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[0, 3] = tx
    E[1, 3] = ty
    P = E.copy()
    P[:3, :4] = K @ E[:3, :4]
    return P


@pytest.fixture(scope="module")
def scene():
    # W=160 > 128 keeps multi-X-block rows; H=32 spans 4 Y-blocks; the
    # geometry (K scales with H/W) is shape-invariant, so the slimmer scene
    # exercises the same window routing at ~24x less interpret-mode work
    H, W, C, D = 32, 160, 32, 3
    rng = np.random.RandomState(0)
    fea = rng.rand(H, W, C).astype(np.float32)
    K = np.array([[0.7 * W, 0, W / 8], [0, 0.7 * W, H / 8], [0, 0, 1]], np.float32)
    dv = np.linspace(425, 905, D, dtype=np.float32)
    return H, W, C, D, fea, K, dv


# v1 single-view kernel, superseded by ops/pallas/sweep_variance.py (which
# has its own fast-tier parity test); first interpret-mode use pays ~40 s of
# warmup on this 1-core host, so numeric parity rides the slow tier
@pytest.mark.slow
@pytest.mark.parametrize("tx,ty", [(0.0, 0.0), (-2.0, 0.0), (-3.0, 2.0)])
def test_pallas_warp_matches_xla(scene, tx, ty):
    H, W, C, D, fea, K, dv = scene
    src, ref = _proj(K, tx=tx, ty=ty), _proj(K)
    expected = warp_src_feature(
        jnp.asarray(fea)[None], jnp.asarray(src)[None],
        jnp.asarray(ref)[None], jnp.asarray(dv)[None],
    )[0]
    out, valid = warp_src_feature_pallas(
        jnp.asarray(fea), jnp.asarray(src), jnp.asarray(ref), jnp.asarray(dv),
        interpret=True,
    )
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=5e-4)


def test_pallas_warp_flags_unsupported_geometry(scene):
    """Strong rotations exceed the static window envelope; the plan must
    say so rather than return silently wrong values."""
    H, W, C, D, fea, K, dv = scene
    src, ref = _proj(K, tx=-2.0, rot_deg=10.0), _proj(K)
    plan = plan_windows(jnp.asarray(src), jnp.asarray(ref), jnp.asarray(dv), H, W)
    assert not bool(plan.valid)


def test_plan_windows_shapes(scene):
    H, W, C, D, fea, K, dv = scene
    plan = plan_windows(
        jnp.asarray(_proj(K, tx=-1.0)), jnp.asarray(_proj(K)), jnp.asarray(dv), H, W
    )
    nYB, nXB = -(-H // 8), -(-W // 128)
    assert plan.patch_y0.shape == (nYB, nXB)
    assert plan.woff_y.shape == (D, nYB, 8, nXB)
    # 128-aligned patch cols
    assert np.all(np.asarray(plan.patch_x0) % 128 == 0)
