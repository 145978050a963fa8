"""Paired training sweep (ops/paired_sweep.py): fused Pallas variance
forward + inverse-warp Pallas backward in one custom_vjp.

Interpret-mode cases ride the slow tier (~1-2 min each on this 1-core
host); real-TPU numerics are exercised by scripts/bench_train_step.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops.paired_sweep import (
    make_paired_cost_volume,
    suggest_family_envelopes,
)
from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
    sweep_variance_pallas,
)
from scene_3dreconstruction_mvsnet_tpu.ops.plane_sweep import cost_volume_variance
from scene_3dreconstruction_mvsnet_tpu.ops.sampling import warp_src_feature


def _rig(H, W, C, D, V=3, rot_deg=1.0, seed=0):
    rng = np.random.RandomState(seed)
    fea = rng.rand(V, H, W, C).astype(np.float32)
    K = np.array([[0.7 * W, 0, W / 8], [0, 0.7 * W, H / 8], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        a = np.deg2rad(rot_deg * v)
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[0, 3] = -2.0 * v
        E[1, 3] = 0.3 * v
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        projs.append(P)
    dv = np.linspace(425.0, 905.0, D, dtype=np.float32)
    return fea, np.stack(projs), dv


def test_family_envelope_merging():
    H, W, C, D = 16, 128, 32, 4
    _, p_a, dv_a = _rig(H, W, C, D, rot_deg=0.0)
    _, p_b, dv_b = _rig(H, W, C, D, rot_deg=3.0)
    s_a, g_a = suggest_family_envelopes([(p_a, dv_a)], H, W)
    s_ab, g_ab = suggest_family_envelopes([(p_a, dv_a), (p_b, dv_b)], H, W)
    # merged envelope dominates each member's
    assert all(m >= a for m, a in zip(s_ab, s_a))
    assert all(m >= a for m, a in zip(g_ab, g_a))
    # pr multiples of 8, kx even, pcp multiple of 128
    assert s_ab[1] % 8 == 0 and g_ab[2] % 8 == 0
    assert g_ab[0] % 2 == 0 and s_ab[2] % 128 == 0
    with pytest.raises(ValueError):
        suggest_family_envelopes([], H, W)


@pytest.mark.slow
def test_emit_warps_matches_xla_warp():
    """emit_warps=True returns each source view's warped volume (the values
    the variance accumulates) — checked against the XLA warp oracle."""
    H, W, C, D, V = 16, 128, 32, 2, 3
    fea, projs, dv = _rig(H, W, C, D, V)
    senv, _ = suggest_family_envelopes([(projs, dv)], H, W)
    fb = jnp.asarray(fea).astype(jnp.bfloat16)
    var, warps, valid = sweep_variance_pallas(
        fb, jnp.asarray(projs), jnp.asarray(dv), interpret=True,
        out_dtype=jnp.float32, emit_warps=True,
        yspan=senv[0], pr=senv[1], pcp=senv[2],
    )
    assert bool(valid)
    assert warps.shape == (V - 1, D, H, W, C)
    for v in range(V - 1):
        want = warp_src_feature(
            fb.astype(jnp.float32)[v + 1][None],
            jnp.asarray(projs[v + 1])[None], jnp.asarray(projs[0])[None],
            jnp.asarray(dv)[None],
        )[0]
        scale = max(1e-6, float(jnp.abs(want).max()))
        np.testing.assert_allclose(
            np.asarray(warps[v]), np.asarray(want), atol=1e-2 * scale
        )


@pytest.mark.slow
def test_paired_grad_matches_autodiff():
    """Gradients through the paired custom_vjp == XLA autodiff of the same
    bf16 sweep, for every view including the unwarped reference view."""
    H, W, C, D, V = 16, 128, 32, 2, 3
    fea, projs, dv = _rig(H, W, C, D, V)
    senv, genv = suggest_family_envelopes([(projs, dv)], H, W)
    paired = make_paired_cost_volume(*senv, *genv, interpret=True)

    fb = jnp.asarray(fea)
    pj = jnp.asarray(projs)[None]
    dvj = jnp.asarray(dv)[None]

    def loss_paired(f):
        vol, valid = paired(f[None].astype(jnp.bfloat16), pj, dvj)
        return jnp.sum(vol.astype(jnp.float32) ** 2), valid

    def loss_xla(f):
        vol = cost_volume_variance(
            f[None].astype(jnp.bfloat16).astype(jnp.float32), pj, dvj
        )
        return jnp.sum(vol ** 2)

    (lp, valid), gp = jax.value_and_grad(loss_paired, has_aux=True)(fb)
    lx, gx = jax.value_and_grad(loss_xla)(fb)
    assert bool(valid)
    # primal: bf16 kernel vs f32-accumulated XLA
    assert abs(float(lp) - float(lx)) < 2e-2 * abs(float(lx))
    scale = max(1e-6, float(jnp.abs(gx).max()))
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), atol=2e-2 * scale
    )


@pytest.mark.slow
def test_paired_flags_out_of_envelope_rig():
    """A rig beyond the envelope must surface valid=False (the paired path
    never falls back — the Trainer is responsible for acting on it)."""
    H, W, C, D, V = 16, 128, 32, 2, 3
    fea, projs, dv = _rig(H, W, C, D, V, rot_deg=25.0)
    # envelope planned for a near-translation rig
    fea2, projs2, dv2 = _rig(H, W, C, D, V, rot_deg=0.0)
    senv, genv = suggest_family_envelopes([(projs2, dv2)], H, W)
    paired = make_paired_cost_volume(*senv, *genv, interpret=True)
    _, valid = paired(
        jnp.asarray(fea)[None].astype(jnp.bfloat16),
        jnp.asarray(projs)[None], jnp.asarray(dv)[None],
    )
    assert not bool(valid)


def test_den_sign_crossing_invalidates_plans():
    """A camera near the plane-at-infinity crossing (projective denominator
    changes sign inside the image) breaks the corner-evaluated window
    bounds; both planners must flag the plan invalid even with an enormous
    envelope (ADVICE r2: corner min/max only bounds monotonic maps)."""
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        plan_sweep,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.warp_grad import plan_grad

    H, W = 32, 160
    K = np.array([[0.7 * W, 0, W / 8], [0, 0.7 * W, H / 8], [0, 0, 1]], np.float32)

    def proj(a_deg):
        a = np.deg2rad(a_deg)
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[0, 3] = -2.0
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        return jnp.asarray(P)

    # near-plane at depth 2 + 45 deg yaw puts the denominator zero inside
    # the image for the nearest hypotheses
    dv = jnp.asarray(np.linspace(2.0, 905.0, 5, dtype=np.float32))
    ref = proj(0.0)
    src = proj(45.0)
    huge = dict(yspan=64, pr=128, pcp=1024)
    assert not bool(plan_sweep(src[None], ref, dv, H, W, **huge).valid)
    assert not bool(
        plan_grad(src, ref, dv, H, W, kx=16, yspan=32, pr=64, pcp=512).valid
    )
    # a sane far-depth range on the same rig geometry stays monotonic:
    # the checks must not over-reject
    dv_far = jnp.asarray(np.linspace(425.0, 905.0, 5, dtype=np.float32))
    src_mild = proj(2.0)
    assert bool(plan_sweep(src_mild[None], ref, dv_far, H, W, **huge).valid)


def test_trainer_check_plan_raises():
    from scene_3dreconstruction_mvsnet_tpu.train.loop import Trainer

    class _T(Trainer):  # skip full __init__, test the check in isolation
        def __init__(self, plan_check):
            self.plan_check = plan_check

    with pytest.raises(RuntimeError, match="untrustworthy"):
        _T("raise")._check_plan(jnp.asarray(False), epoch=0, batch_idx=3)
    # warn path returns the reset accumulator without raising
    assert _T("warn")._check_plan(jnp.asarray(False), 0, 3) is None
    assert _T("raise")._check_plan(jnp.asarray(True), 0, 3) is None
    assert _T("raise")._check_plan(None, 0, 3) is None
