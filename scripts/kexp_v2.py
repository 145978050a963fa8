"""Validate + benchmark the fused sweep-variance kernel v2 on real TPU.

Usage: python scripts/kexp_v2.py [small|bench|dtu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
    sweep_variance_pallas,
    suggest_envelope,
)
from scene_3dreconstruction_mvsnet_tpu.ops.plane_sweep import cost_volume_variance


def make_rig(H, W, C, D, V, rot_deg=0.0, seed=0):
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


def check(mode):
    if mode == "small":
        H, W, C, D, V = 64, 160, 32, 8, 3
    else:
        H, W, C, D, V = 216, 288, 32, 192, 5

    fea, projs, dv = make_rig(H, W, C, D, V, rot_deg=(2.0 if mode == "small" else 0.0))
    fea_bf = jnp.asarray(fea).astype(jnp.bfloat16)
    env = suggest_envelope(projs[1:], projs[0], dv, H, W)
    print("envelope:", env)

    t0 = time.time()
    out, valid = sweep_variance_pallas(
        fea_bf, jnp.asarray(projs), jnp.asarray(dv), **env
    )
    out = jax.block_until_ready(out)
    print(f"pallas compile+run: {time.time()-t0:.1f}s valid={bool(valid)}")
    assert bool(valid), "plan says invalid for this rig!"

    # XLA reference (f32 features -> f32 accumulate for a precise oracle);
    # chunk the depth axis so the footprints fit HBM at full size
    ref = cost_volume_variance(
        jnp.asarray(fea_bf.astype(jnp.float32))[None],
        jnp.asarray(projs)[None],
        jnp.asarray(dv)[None],
        depth_chunk=(None if D <= 16 else 16),
    )[0]
    ref = np.asarray(jax.block_until_ready(ref))
    got = np.asarray(out, np.float32)
    scale = max(1e-6, np.abs(ref).max())
    err = np.abs(got - ref).max() / scale
    # bf16 output quantization alone gives ~4e-3 relative
    print(f"max rel err vs f32 XLA oracle: {err:.2e} (scale {scale:.3f})")
    ok = err < 2e-2
    print("CORRECT" if ok else "MISMATCH!")
    if not ok:
        bad = np.unravel_index(np.argmax(np.abs(got - ref)), ref.shape)
        print("worst at", bad, "got", got[bad], "want", ref[bad])
        d, y, x, c = bad
        print("neighborhood got ", got[d, y, max(0,x-2):x+3, c])
        print("neighborhood want", ref[d, y, max(0,x-2):x+3, c])
    return ok


def bench():
    H, W, C, D, V = 216, 288, 32, 192, 5
    fea, projs, dv = make_rig(H, W, C, D, V)
    env = suggest_envelope(projs[1:], projs[0], dv, H, W)
    print("envelope:", env)

    fea_bf = jax.device_put(jnp.asarray(fea).astype(jnp.bfloat16))
    projs_d = jax.device_put(jnp.asarray(projs))
    dv_d = jax.device_put(jnp.asarray(dv))

    @jax.jit
    def many(fea, projs, dv):
        def body(c, _):
            out, _v = sweep_variance_pallas(fea + c, projs, dv, **env)
            return c + out[0, 0, 0, 0].astype(jnp.bfloat16) * 0, out[0, 0, 0, 0]
        c, outs = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=10)
        return outs

    t0 = time.time()
    r = jax.block_until_ready(many(fea_bf, projs_d, dv_d))
    print(f"compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    r = np.asarray(many(fea_bf, projs_d, dv_d))
    dt = (time.time() - t0) / 10
    print(f"fused sweep (4 src views, D={D}, {H}x{W}x{C}): {dt*1e3:.1f} ms "
          f"(= {dt/4*1e3:.1f} ms/view-equiv)")

    # XLA baseline for the same op
    @jax.jit
    def many_xla(fea, projs, dv):
        def body(c, _):
            out = cost_volume_variance(fea[None] + c, projs[None], dv[None],
                                       depth_chunk=48)
            return c, out[0, 0, 0, 0, 0]
        c, outs = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=10)
        return outs

    jax.block_until_ready(many_xla(fea_bf, projs_d, dv_d))
    t0 = time.time()
    np.asarray(many_xla(fea_bf, projs_d, dv_d))
    dt_x = (time.time() - t0) / 10
    print(f"XLA sweep baseline: {dt_x*1e3:.1f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode == "bench":
        bench()
    else:
        check(mode)
