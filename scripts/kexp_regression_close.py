"""Close the softmax-regression lever: RTT-corrected A/B of every variant.

The round-5 roofline flagged `fused_softmax_regression` at 2.57 ms against a
~0.12 ms HBM floor; rewrites measured 2.92 (fori_loop) and 2.75 (static
unroll). A first version of THIS script then measured 0.075 ms for the same
kernel — an implausible 35x step that smelled like loop-invariant code
motion folding the timing scan (its input perturbation was `+ leaf*0`).

This script settles the question in ONE process (the axon relay's
per-process D2H channel tax makes multi-process iteration absurd) with two
defenses the earlier sustained timers lacked:

  - the scan carry feeds the PREVIOUS iteration's output back into the
    next input as `x + leaf * 1e-30f` — data-dependent, unfoldable;
  - every variant is timed at iters=10 AND iters=50: a true per-iter cost
    reads the same at both; a hoisted body reads 5x smaller at 50.

Variants: plain-XLA path, the static-unroll Pallas kernel at tile_h in
{8, 16, 32}, and bf16-cost feeds of both, at the headline rotation-ring
regression shape (D=192, 216x288).

Run: timeout 3600 python scripts/kexp_regression_close.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((8,)) + 1), daemon=True
    ).start()

    from scene_3dreconstruction_mvsnet_tpu.ops.regression import (
        regress_depth_and_confidence,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.softmax_regression import (
        fused_softmax_regression,
    )

    rng = np.random.RandomState(0)
    D, h4, w4 = 192, 216, 288
    cost = jnp.asarray(rng.rand(1, D, h4, w4).astype(np.float32) * 8 - 4)
    cost_bf16 = cost.astype(jnp.bfloat16)
    dv = jnp.asarray(np.linspace(425.0, 905.0, D, dtype=np.float32)[None])

    # tunnel RTT: one per sustained wall regardless of iters
    f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f(jnp.float32(0.0)))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(f(jnp.float32(t0 % 1.0)))
        ts.append(time.time() - t0)
    rtt_ms = sorted(ts)[2] * 1e3
    print(f"tunnel RTT {rtt_ms:.1f} ms", flush=True)

    def sustained_ms(fn, args, iters, reps=3):
        @jax.jit
        def many(*a):
            def body(c, _):
                out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                # feed the output back at 1e-30 scale: numerically inert,
                # but data-dependent so nothing hoists out of the scan
                return leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30, leaf.reshape(-1)[0]

            _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return outs

        jax.block_until_ready(many(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(many(*args))
            best = min(best, max(0.01, (time.time() - t0) * 1e3 - rtt_ms))
        return best / iters

    results = {"rtt_ms": round(rtt_ms, 1)}

    variants = [
        ("xla_f32", lambda c, d: regress_depth_and_confidence(c, d), (cost, dv)),
        ("xla_bf16", lambda c, d: regress_depth_and_confidence(c, d), (cost_bf16, dv)),
        ("pallas_f32_th8", lambda c, d: fused_softmax_regression(c, d, tile_h=8), (cost, dv)),
        ("pallas_f32_th16", lambda c, d: fused_softmax_regression(c, d, tile_h=16), (cost, dv)),
        ("pallas_f32_th32", lambda c, d: fused_softmax_regression(c, d, tile_h=32), (cost, dv)),
        ("pallas_bf16_th16", lambda c, d: fused_softmax_regression(c, d, tile_h=16), (cost_bf16, dv)),
    ]
    for name, fn, args in variants:
        try:
            ms10 = sustained_ms(fn, args, iters=10)
            ms50 = sustained_ms(fn, args, iters=50)
        except Exception as e:  # noqa: BLE001 — record the lowering failure
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            results[f"{name}_ms"] = None
            continue
        hoisted = ms10 > 2.5 * ms50
        print(
            f"{name}: {ms50:.3f} ms (iters=50) vs {ms10:.3f} ms (iters=10)"
            f"{'  ** NONLINEAR — hoisting suspected **' if hoisted else ''}",
            flush=True,
        )
        results[f"{name}_ms"] = round(ms50, 3)
        results[f"{name}_ms_i10"] = round(ms10, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
