"""Fused plane-sweep variance kernel tests (interpret mode; real-TPU
correctness and perf are exercised by scripts/kexp_v2.py — see kernel
docstring for measured numbers)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
    pack_features,
    plan_sweep,
    suggest_envelope,
    sweep_variance_pallas,
)
from scene_3dreconstruction_mvsnet_tpu.ops.plane_sweep import cost_volume_variance


def _rig(H, W, C, D, V, rot_deg=0.0, seed=0):
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


def test_pack_features_exact_roundtrip(rng):
    fea = rng.rand(16, 10, 32).astype(np.float32)
    bf = np.asarray(jnp.asarray(fea).astype(jnp.bfloat16), np.float32)
    p0, p1 = map(np.asarray, pack_features(jnp.asarray(fea)))
    # unpack on host: bf16 occupies the top 16 bits of f32
    u = p0.view(np.uint32)
    lo = ((u << 16) & 0xFFFFFFFF).astype(np.uint32).view(np.float32)
    hi = (u & 0xFFFF0000).view(np.float32)
    np.testing.assert_array_equal(lo, np.transpose(bf[:, 0::2, :16], (0, 2, 1)))
    np.testing.assert_array_equal(hi, np.transpose(bf[:, 0::2, 16:], (0, 2, 1)))
    u1 = p1.view(np.uint32)
    lo1 = ((u1 << 16) & 0xFFFFFFFF).astype(np.uint32).view(np.float32)
    np.testing.assert_array_equal(lo1, np.transpose(bf[:, 1::2, :16], (0, 2, 1)))


@pytest.mark.parametrize(
    "rot_deg,V",
    [
        (0.0, 3),
        # interpret mode runs ~1 min/case on this 1-core host; the rotated
        # and 5-view rigs ride the slow tier (and scripts/kexp_v2.py on TPU)
        pytest.param(2.0, 3, marks=pytest.mark.slow),
        pytest.param(0.0, 5, marks=pytest.mark.slow),
    ],
)
def test_fused_sweep_matches_xla(rot_deg, V):
    H, W, C, D = 32, 160, 32, 3
    fea, projs, dv = _rig(H, W, C, D, V, rot_deg=rot_deg)
    fea_bf = jnp.asarray(fea).astype(jnp.bfloat16)
    env = suggest_envelope(projs[1:], projs[0], dv, H, W)

    out, valid = sweep_variance_pallas(
        fea_bf, jnp.asarray(projs), jnp.asarray(dv),
        interpret=True, out_dtype=jnp.float32, **env,
    )
    assert bool(valid)

    ref = cost_volume_variance(
        fea_bf.astype(jnp.float32)[None], jnp.asarray(projs)[None],
        jnp.asarray(dv)[None],
    )[0]
    scale = float(np.abs(np.asarray(ref)).max())
    # kernel interpolates/accumulates in f32 from bf16 features; the XLA
    # oracle interpolates in f32 from the same bf16 features, so the only
    # differences are association order — tight tolerance
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3 * scale
    )


@pytest.mark.parametrize(
    "rot_deg",
    [
        # rot 0: yspan (2,2) — rowskip must be a structural no-op
        0.0,
        # rot 2: yspan (3,4), mean nry 2.54 — the gates actually fire
        pytest.param(2.0, marks=pytest.mark.slow),
    ],
)
def test_rowskip_matches_xla(rot_deg):
    """rowskip=True (per-position pl.when row gating through the VMEM
    accumulator scratch) must match the XLA oracle exactly as tightly as
    the ungated kernel — skipped rows carry zero bilinear weight by
    construction (plan_sweep's nry)."""
    H, W, C, D = 32, 160, 32, 3
    fea, projs, dv = _rig(H, W, C, D, 3, rot_deg=rot_deg)
    fea_bf = jnp.asarray(fea).astype(jnp.bfloat16)
    env = suggest_envelope(projs[1:], projs[0], dv, H, W)
    plan = plan_sweep(
        jnp.asarray(projs[1:]), jnp.asarray(projs[0]), jnp.asarray(dv),
        H, W, **env,
    )
    nry = np.asarray(plan.nry)
    yspans = np.asarray(env["yspan"]).reshape(-1, 1, 1, 1, 1)
    assert nry.max() <= max(env["yspan"])
    if rot_deg == 0.0:
        # translation rig: every view's envelope is already 2 rows — the
        # kernel must compile the plain (gate-free) variant
        assert max(env["yspan"]) == 2 and (nry == 2).all()
    else:
        # the skip must actually fire: views whose envelope exceeds 2 rows
        # must have positions needing fewer than their static span (the
        # measured rotation-rig property kexp_rowskip_stats.py quantifies);
        # together with the output-equality check below this pins nry from
        # both sides (too small -> wrong variance; never smaller than the
        # span -> the gate is dead weight)
        assert (nry < yspans).any(), "rowskip gating never fires on rot rig"
        per_view_fire = (nry < yspans).reshape(nry.shape[0], -1).any(axis=1)
        assert per_view_fire[np.asarray(env["yspan"]) > 2].all()

    out, valid = sweep_variance_pallas(
        fea_bf, jnp.asarray(projs), jnp.asarray(dv),
        interpret=True, out_dtype=jnp.float32, rowskip=True, **env,
    )
    assert bool(valid)
    ref = cost_volume_variance(
        fea_bf.astype(jnp.float32)[None], jnp.asarray(projs)[None],
        jnp.asarray(dv)[None],
    )[0]
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3 * scale
    )


def test_fused_sweep_flags_unsupported_geometry():
    H, W, C, D = 32, 160, 32, 3
    fea, projs, dv = _rig(H, W, C, D, 3, rot_deg=25.0)
    plan = plan_sweep(
        jnp.asarray(projs[1:]), jnp.asarray(projs[0]), jnp.asarray(dv), H, W,
        yspan=2, pr=16, pcp=256,
    )
    assert not bool(plan.valid)


def test_cost_volume_variance_pallas_dispatch_fallback():
    """cost_volume_variance(pallas_env=...) must produce the XLA result
    (bitwise) via the lax.cond fallback when the envelope is too small for
    the rig."""
    H, W, C, D = 32, 160, 32, 3
    fea, projs, dv = _rig(H, W, C, D, 3, rot_deg=25.0)
    env = (2, 16, 256)
    plan = plan_sweep(
        jnp.asarray(projs[1:]), jnp.asarray(projs[0]), jnp.asarray(dv), H, W,
        yspan=env[0], pr=env[1], pcp=env[2],
    )
    assert not bool(plan.valid), "test premise: rig must exceed the envelope"
    fea_bf = jnp.asarray(fea).astype(jnp.bfloat16)
    out = cost_volume_variance(
        fea_bf[None], jnp.asarray(projs)[None], jnp.asarray(dv)[None],
        pallas_env=env,
    )
    ref = cost_volume_variance(
        fea_bf[None], jnp.asarray(projs)[None], jnp.asarray(dv)[None],
    )
    # same XLA sweep, but compiled inside a lax.cond branch — fusion points
    # differ, so bf16 rounding differs by ulps; assert to bf16 tolerance
    ref_f = np.asarray(ref, np.float32)
    scale = max(1e-6, np.abs(ref_f).max())
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref_f, atol=1.5e-2 * scale
    )
