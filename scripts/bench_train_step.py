"""Time the DEVICE train step at the DTU recipe geometry on one chip.

NOTE: this times the jitted step only, at --batch 1 by default — it is NOT
the full shipped recipe (scripts/train_DTU.sh trains at batch 4) and it
excludes the host input pipeline entirely. For the end-to-end number
(decode + collate + u8 pack + transfer + step, at bs4) run
scripts/bench_train_e2e.py; BASELINE.md records both.

Round-1: 32 s/step (XLA scatter-add backward + remat recompute).
Round-2: 0.46 s/step (XLA sweep forward + inverse-warp Pallas backward).
Round-3: paired custom-VJP (fused Pallas sweep forward + inverse-warp
Pallas backward, ops/paired_sweep.py) is the default.

Usage: python scripts/bench_train_step.py
         [--xla]         # full XLA path (scatter-add backward)
         [--no-paired]   # round-2 path: XLA sweep fwd + Pallas bwd
         [--remat] [--batch N] [--flat]
         [--sustained]   # time N steps INSIDE one jit (lax.scan over the
                         # real state carry) — excludes the ~27 ms/call
                         # tunnel RTT that per-dispatch timing includes
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train import (
        TrainState, make_optimizer, make_train_step,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.paired_sweep import (
        suggest_family_envelopes,
    )

    B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 1
    use_pallas = "--xla" not in sys.argv
    paired = use_pallas and "--no-paired" not in sys.argv
    flat = "--flat" in sys.argv
    remat = "--remat" in sys.argv
    V, H, W, D = 3, 512, 640, 192

    rng = np.random.RandomState(0)
    K = np.array([[W * 0.7, 0, W / 8], [0, W * 0.7, H / 8], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = -2.0 * v
        P = E.copy()
        P[:3, :4] = (K / 4.0) @ E[:3, :4]
        projs.append(P)
    proj = np.broadcast_to(np.stack(projs)[None], (B, V, 4, 4)).copy()
    dv = np.broadcast_to(
        np.linspace(425, 905, D, dtype=np.float32)[None], (B, D)
    ).copy()

    grad_env = sweep_env = None
    if use_pallas:
        sweep_env, grad_env = suggest_family_envelopes(
            [(np.stack(projs), dv[0])], H // 4, W // 4
        )
        if not paired:
            sweep_env = None
        print("envelopes: sweep", sweep_env, "grad", grad_env)

    model = MVSNet(
        dtype=jnp.bfloat16,
        depth_chunk=None if paired else 48,
        remat=remat,
        pallas_grad_env=grad_env,
        pallas_sweep_env=sweep_env,
        flat_features=flat,
        flat_costreg=flat,
    )
    batch = {
        "imgs": jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32)),
        "proj_matrices": jnp.asarray(proj),
        "depth_values": jnp.asarray(dv),
        "depth": jnp.asarray(
            rng.uniform(425, 905, (B, H // 4, W // 4)).astype(np.float32)
        ),
        "mask": jnp.ones((B, H // 4, W // 4), jnp.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"],
    )
    state = TrainState.create(variables, make_optimizer(lambda s: 1e-3))
    step_fn = make_train_step(model)
    step = jax.jit(step_fn)
    mode = f"pallas_grad={use_pallas} paired={paired} flat={flat} remat={remat} B={B}"

    if "--sustained" in sys.argv:
        # steps chained inside one jit: the real TrainState is the scan
        # carry, so every step consumes the previous step's params/opt
        # state; per-step losses are returned (and must decrease) so no
        # step can be dead-code-eliminated.
        iters = 5

        @jax.jit
        def sustained(state, batch):
            def body(s, _):
                s2, aux = step_fn(s, batch)
                return s2, aux["loss"]
            return jax.lax.scan(body, state, None, length=iters)

        t0 = time.time()
        _, losses = sustained(state, batch)
        losses = np.asarray(losses)
        print(f"compile+first scan: {time.time()-t0:.1f}s losses={losses[:3]}")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _, losses = sustained(state, batch)
            _ = np.asarray(losses)
            best = min(best, (time.time() - t0) / iters)
        print(f"train step sustained ({mode}, {V}v {H}x{W} D{D} bf16): "
              f"{best:.3f} s/step")
        return

    t0 = time.time()
    state, aux = step(state, batch)
    loss = float(aux["loss"])
    if "plan_valid" in aux:
        assert bool(aux["plan_valid"]), "paired sweep plan invalid for this rig"
    print(f"compile+first step: {time.time()-t0:.1f}s loss={loss:.3f}")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        state, aux = step(state, batch)
        _ = float(aux["loss"])  # force
    dt = (time.time() - t0) / iters
    print(f"train step ({mode}, {V}v {H}x{W} D{D} bf16): {dt:.2f} s/step "
          f"(per-dispatch; --sustained excludes the client RTT)")


if __name__ == "__main__":
    main()
