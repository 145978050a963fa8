"""Validate + benchmark the inverse-warp gradient kernel on real TPU.

Usage: python scripts/kexp_grad.py [small|train|bench]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops.pallas.warp_grad import (
    warp_grad_pallas,
    suggest_grad_envelope,
    make_warp_with_pallas_grad,
)
from scene_3dreconstruction_mvsnet_tpu.ops.sampling import warp_src_feature


def make_rig(H, W, C, D, rot_deg=0.0, seed=0):
    rng = np.random.RandomState(seed)
    fea = rng.rand(H, W, C).astype(np.float32)
    K = np.array([[0.7 * W, 0, W / 8], [0, 0.7 * W, H / 8], [0, 0, 1]], np.float32)
    a = np.deg2rad(rot_deg)
    R = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float32,
    )
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[0, 3] = -2.0
    E[1, 3] = 0.3
    src = E.copy()
    src[:3, :4] = K @ E[:3, :4]
    ref = np.eye(4, dtype=np.float32)
    ref[:3, :4] = K @ ref[:3, :4]
    dv = np.linspace(425.0, 905.0, D, dtype=np.float32)
    g = rng.rand(D, H, W, C).astype(np.float32)
    return fea, src, ref, dv, g


def check(mode):
    if mode == "small":
        H, W, C, D, rot = 32, 160, 32, 6, 2.0
    else:
        H, W, C, D, rot = 128, 160, 32, 192, 0.0

    fea, src, ref, dv, g = make_rig(H, W, C, D, rot_deg=rot)
    env = suggest_grad_envelope(src[None], ref, dv, H, W)
    print("grad envelope:", env)

    t0 = time.time()
    dsrc, valid = warp_grad_pallas(
        jnp.asarray(g), jnp.asarray(src), jnp.asarray(ref), jnp.asarray(dv), **env
    )
    dsrc = np.asarray(jax.block_until_ready(dsrc))
    print(f"pallas grad compile+run: {time.time()-t0:.1f}s valid={bool(valid)}")
    assert bool(valid), "grad plan invalid for this rig!"

    # XLA autodiff oracle
    def f(x):
        return warp_src_feature(
            x[None], jnp.asarray(src)[None], jnp.asarray(ref)[None],
            jnp.asarray(dv)[None],
        )[0]

    _, vjp = jax.vjp(f, jnp.asarray(fea))
    want = np.asarray(jax.block_until_ready(vjp(jnp.asarray(g))[0]))

    scale = max(1e-6, np.abs(want).max())
    err = np.abs(dsrc - want).max() / scale
    print(f"max rel err vs XLA autodiff: {err:.2e} (scale {scale:.2f})")
    ok = err < 1e-4
    print("CORRECT" if ok else "MISMATCH!")
    if not ok:
        bad = np.unravel_index(np.argmax(np.abs(dsrc - want)), want.shape)
        print("worst at", bad, "got", dsrc[bad], "want", want[bad])
        y, x, c = bad
        print("got  row", dsrc[y, max(0, x - 3):x + 4, c])
        print("want row", want[y, max(0, x - 3):x + 4, c])
    return ok


def bench():
    # DTU train recipe feature shapes: 512x640 imgs -> 128x160 features, D192
    H, W, C, D = 128, 160, 32, 192
    fea, src, ref, dv, g = make_rig(H, W, C, D)
    env = suggest_grad_envelope(src[None], ref, dv, H, W)
    print("grad envelope:", env)
    g_d = jax.device_put(jnp.asarray(g))
    args = [jax.device_put(jnp.asarray(a)) for a in (src, ref, dv)]

    @jax.jit
    def many(g, src, ref, dv):
        def body(c, _):
            out, _v = warp_grad_pallas(g + c, src, ref, dv, **env)
            return c + out[0, 0, 0] * 0, out[0, 0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return outs

    jax.block_until_ready(many(g_d, *args))
    t0 = time.time()
    np.asarray(many(g_d, *args))
    dt = (time.time() - t0) / 10
    print(f"pallas warp-grad ({H}x{W}x{C}, D={D}): {dt*1e3:.1f} ms/view")

    if "--xla-baseline" in sys.argv:
        # XLA scatter-add transpose baseline — compile alone takes several
        # minutes at these shapes (the pathology this kernel replaces)
        def f(x):
            return warp_src_feature(
                x[None], args[0][None], args[1][None], args[2][None]
            )[0]

        _, vjp = jax.vjp(f, jnp.asarray(fea))

        @jax.jit
        def many_xla(g):
            def body(c, _):
                out = vjp(g + c)[0]
                return c, out[0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=3)
            return outs

        jax.block_until_ready(many_xla(g_d))
        t0 = time.time()
        np.asarray(many_xla(g_d))
        dt_x = (time.time() - t0) / 3
        print(f"XLA scatter-add baseline: {dt_x*1e3:.1f} ms/view")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode == "bench":
        bench()
    else:
        check(mode)
