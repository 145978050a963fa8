"""A/B the data-dependent row-skip sweep kernel on the headline rotation rig.

Round-5 VERDICT item 1: the rowskip variant gates every tap row past the
first two behind a per-position scalar pl.when (accumulating through a VMEM
scratch — the vector-valued lax.cond lowering hangs at Mosaic compile on
this stack, docs/ROUND4_NOTES.md). kexp_rowskip_stats.py measured a 31.7%
upper bound on saved row passes for this rig; this harness measures what the
gate actually buys on the live chip, on the exact bench.py geometry
(49-camera inward ring, feature res 216x288, D=192, V=5).

Run on the TPU host: timeout 900 python scripts/kexp_rowskip_ab.py
Prints one JSON line: {"plain_ms": .., "rowskip_ms": .., "speedup": ..,
"max_rel_err": ..} — correctness is pinned against the plain kernel (same
math; skipped rows carry zero bilinear weight by construction).
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

    from bench import ring_projs
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        suggest_envelope,
        sweep_variance_pallas,
    )

    # async D2H channel warmup (the axon relay's lazy per-process setup,
    # 30-300 s, size-independent) overlapped with planning + compiles
    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((8,)) + 1), daemon=True
    ).start()

    H, W, C, D, V = 216, 288, 32, 192, 5
    IMG_H, IMG_W = 864, 1152
    K = np.array(
        [[IMG_W * 1.1, 0, IMG_W / 2], [0, IMG_W * 1.1, IMG_H / 2], [0, 0, 1]],
        np.float32,
    )
    projs = ring_projs(49, [0, 1, 48, 2, 47], 150.0, -700.0, 700.0, K / 4.0)
    dv = np.linspace(425, 905, D, dtype=np.float32)

    env = suggest_envelope(projs[1:], projs[0], dv, H, W)
    print("envelope:", env, flush=True)
    nry_free = max(env["yspan"]) <= 2
    if nry_free:
        print("NOTE: all yspans <= 2 — rowskip is a structural no-op here")

    rng = np.random.RandomState(0)
    fea = jax.device_put(
        jnp.asarray(rng.rand(V, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    )
    projs_d = jax.device_put(jnp.asarray(projs))
    dv_d = jax.device_put(jnp.asarray(dv))

    def sustained(rowskip):
        @jax.jit
        def many(fea, projs, dv):
            def body(c, _):
                out, _v = sweep_variance_pallas(
                    fea + c, projs, dv, rowskip=rowskip, **env
                )
                return c + out[0, 0, 0, 0].astype(jnp.bfloat16) * 0, out[0, 0, 0, 0]

            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=10)
            return outs

        t0 = time.time()
        jax.block_until_ready(many(fea, projs_d, dv_d))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(many(fea, projs_d, dv_d))
            best = min(best, (time.time() - t0) / 10)
        return best, compile_s

    # correctness first (also the compile canary: if the pl.when lowering
    # wedges like the lax.cond one did, the timeout fires here, not in a
    # 10-deep scan)
    t0 = time.time()
    out_skip, valid = sweep_variance_pallas(fea, projs_d, dv_d, rowskip=True, **env)
    out_skip = jax.block_until_ready(out_skip)
    print(f"rowskip compile+run: {time.time() - t0:.1f}s valid={bool(valid)}",
          flush=True)
    out_plain, _ = sweep_variance_pallas(fea, projs_d, dv_d, rowskip=False, **env)
    a = np.asarray(out_skip, np.float32)
    b = np.asarray(jax.block_until_ready(out_plain), np.float32)
    scale = max(1e-6, np.abs(b).max())
    max_rel_err = float(np.abs(a - b).max() / scale)
    print(f"rowskip vs plain max rel err: {max_rel_err:.2e}", flush=True)

    plain_ms, plain_c = sustained(False)
    skip_ms, skip_c = sustained(True)
    print(json.dumps({
        "rig": "rotation_ring49",
        "envelope": {"yspan": list(env["yspan"]), "pr": env["pr"], "pcp": env["pcp"]},
        "plain_ms": round(plain_ms * 1e3, 2),
        "rowskip_ms": round(skip_ms * 1e3, 2),
        "speedup": round(plain_ms / skip_ms, 3),
        "compile_s": {"plain": round(plain_c, 1), "rowskip": round(skip_c, 1)},
        "max_rel_err": max_rel_err,
    }))


if __name__ == "__main__":
    main()
