"""Empirical VPU ceilings for the two Pallas hot spots (round-5 roofline).

CAVEAT (round 5): this script's sustained_ms does NOT subtract the ~28 ms
per-dispatch tunnel RTT, so at iters=10 anything under ~3 ms/iter reads as
~RTT/10 — its "2.75 ms" for the streaming regression kernel was exactly
that artifact; the kernel is really ~0.11 ms (scripts/
kexp_regression_close.py, RTT-corrected at iters=50). The sweep
microkernel numbers below (37-51 ms/iter) are far above the artifact floor
and carry at most ~+3 ms of RTT each — the 59%-of-ceiling conclusion
stands.

1. Re-time the STREAMING softmax-regression kernel (the first version
   materialized [D, TH, TW] values -> ~190 vregs per op vs 64 physical;
   measured 2.57 ms at D192/216x288 against a ~0.12 ms HBM floor).
2. Gather-issue ceiling for the sweep kernel: microkernels that run ONLY
   the sweep's per-step dynamic_gather count (A), and the full row_taps
   instruction mix at the same counts (B), on the same (27, 3, 192) grid.
   Comparing A/B to the real kernel's 62.1 ms tells whether the sweep is
   gather-issue-bound (lever closed) or has slack to recover.

Run on the TPU host: timeout 1800 python scripts/kexp_vpu_ceiling.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GRID = (27, 3, 192)          # the sweep kernel's DTU-full/headline grid
ROWTAPS_PER_STEP = 8 * 4 * 3 * 2   # rows x views x tap-rows x channel-groups
GATHERS_PER_ROWTAP = 4


def sustained_ms(fn, args, iters=10, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(a[0] + c, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32) * 0, leaf.reshape(-1)[0]

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return outs

    jax.block_until_ready(many(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(many(*args))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((8,)) + 1), daemon=True
    ).start()

    results = {}

    # ---- 1. streaming softmax regression ----
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.softmax_regression import (
        fused_softmax_regression,
    )

    rng = np.random.RandomState(0)
    D, h4, w4 = 192, 216, 288
    cost = jnp.asarray(rng.rand(1, D, h4, w4).astype(np.float32))
    dv = jnp.asarray(np.linspace(425, 905, D, dtype=np.float32)[None])
    ms = sustained_ms(lambda c, d: fused_softmax_regression(c, d), (cost, dv))
    print(f"streaming softmax regression: {ms:.2f} ms "
          f"(was 2.57 ms materialized; HBM floor ~0.12 ms)", flush=True)
    results["regression_ms"] = round(ms, 3)

    # ---- 2. gather microkernels on the sweep grid ----
    def make_micro(mix: str, n_rowtaps: int):
        def kernel(x_ref, o_ref, win_ref):
            # stage a 256-lane window once per tile
            @pl.when(pl.program_id(2) == 0)
            def _():
                win_ref[...] = x_ref[...] * 1.000001

            acc = jnp.zeros((8, 128), jnp.float32)
            base = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            w0 = win_ref[:, :128]
            w1 = win_ref[:, 128:]
            for k in range(n_rowtaps):
                # varying indices defeat CSE; the index add mirrors the
                # real kernel's per-tap index arithmetic
                i_lo = (base + k) & 127
                i_hi = (base + 2 * k + 1) & 127
                if mix == "gather_only":
                    acc = acc + jnp.take_along_axis(w0, i_lo, axis=1)
                    acc = acc + jnp.take_along_axis(w1, i_hi, axis=1)
                    acc = acc + jnp.take_along_axis(w0, i_hi, axis=1)
                    acc = acc + jnp.take_along_axis(w1, i_lo, axis=1)
                else:  # full row_taps mix: 4 gathers + selects + unpack + fma
                    s0 = (base + k) < 64
                    g0 = jnp.where(
                        s0,
                        jnp.take_along_axis(w0, i_lo, axis=1),
                        jnp.take_along_axis(w1, i_hi, axis=1),
                    )
                    g1 = jnp.where(
                        s0,
                        jnp.take_along_axis(w0, i_hi, axis=1),
                        jnp.take_along_axis(w1, i_lo, axis=1),
                    )
                    u = pltpu.bitcast(g0, jnp.uint32)
                    glo = pltpu.bitcast(u << jnp.uint32(16), jnp.float32)
                    ghi = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
                    u1 = pltpu.bitcast(g1, jnp.uint32)
                    g1lo = pltpu.bitcast(u1 << jnp.uint32(16), jnp.float32)
                    g1hi = pltpu.bitcast(u1 & jnp.uint32(0xFFFF0000), jnp.float32)
                    acc = acc + (glo * 0.25 + g1lo * 0.75)
                    acc = acc + (ghi * 0.5 + g1hi * 0.5)
            o_ref[...] = acc

        nYB, nXB, Dg = GRID
        return pl.pallas_call(
            kernel,
            grid=GRID,
            in_specs=[
                pl.BlockSpec((8, 256), lambda yb, xb, d: (yb, xb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda yb, xb, d: (yb, xb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nYB * 8, nXB * 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 256), jnp.float32)],
        )

    x = jnp.asarray(rng.rand(GRID[0] * 8, GRID[1] * 256).astype(np.float32))
    for mix in ("gather_only", "full_mix"):
        fn = make_micro(mix, ROWTAPS_PER_STEP)
        ms = sustained_ms(lambda a, f=fn: f(a), (x,))
        n_g = ROWTAPS_PER_STEP * GATHERS_PER_ROWTAP * np.prod(GRID)
        cyc = ms * 1e-3 * 0.94e9 / (n_g / 1.0)
        print(f"micro {mix}: {ms:.2f} ms for {ROWTAPS_PER_STEP} row-taps/step "
              f"({n_g / 1e6:.1f} M gathers -> {cyc * n_g / n_g:.2f} "
              f"cycles/gather incl. overhead)", flush=True)
        results[f"micro_{mix}_ms"] = round(ms, 2)
        results[f"micro_{mix}_cycles_per_gather"] = round(
            ms * 1e-3 * 0.94e9 / n_g, 2
        )

    results["real_sweep_ms"] = 62.14  # scripts/kexp_rowskip_ab.py, same rig
    results["rowtap_fraction_of_ceiling"] = round(
        results["micro_full_mix_ms"] / results["real_sweep_ms"], 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
