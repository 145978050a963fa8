"""Per-stage roofline/MFU accounting for the headline forward (VERDICT r5
item 3): on the rotation-ring rig (bench.py geometry — 5 views, D=192,
864x1152, feature res 216x288), time each stage in isolation on the live
chip, attribute its binding resource (MXU FLOPs / VPU vector-op issue /
HBM bytes), and report % of the v5e bound achieved + whole-forward MFU.

Stages (models/mvsnet.py forward):
  featurenet  — flat block-Toeplitz conv stack, MXU-bound
  sweep       — fused Pallas plane-sweep variance, VPU-gather-bound
  costreg     — flat 3D U-Net, MXU-bound (with the documented tile-shape
                MAC inflation at small channel counts)
  regression  — fused softmax/depth/conf Pallas kernel, HBM-bound

Run on the TPU host: timeout 1800 python scripts/kexp_roofline.py
Prints a table + one JSON line (consumed by BASELINE.md / ROUND5 notes).

v5e (lite) peaks used: 197 TFLOP/s bf16 MXU, 819 GB/s HBM, and a VPU issue
ceiling of 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85 T vector
elem-ops/s (the public "How to Scale Your Model" v5e numbers).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MXU_BF16 = 197e12
HBM_BPS = 819e9
VPU_OPS = 8 * 128 * 4 * 0.94e9  # elem-ops/s


_RTT_MS = [None]


def measure_rtt_ms():
    """Per-dispatch client overhead through the axon tunnel (~27 ms RTT):
    the wall clock of fetching a trivial jit result. Every sustained-timing
    wall carries ONE of these regardless of iters — at small per-iter costs
    it dominates (a 0.3 ms kernel timed at iters=10 reads as ~3 ms).
    Measured once, median of 5."""
    if _RTT_MS[0] is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(f(jnp.float32(t0 % 1.0)))
            ts.append(time.time() - t0)
        _RTT_MS[0] = sorted(ts)[2] * 1e3
        print(f"tunnel RTT: {_RTT_MS[0]:.1f} ms (subtracted from every "
              f"sustained wall)", flush=True)
    return _RTT_MS[0]


def sustained_ms(fn, args, iters=10, reps=3):
    """Sustained per-iteration ms: ITERS chained calls inside one jit (carry
    perturbs inputs so nothing folds), best of REPS timed dispatches, with
    the one-per-dispatch tunnel RTT subtracted."""
    import jax
    import jax.numpy as jnp

    rtt = measure_rtt_ms()

    @jax.jit
    def many(*args):
        def body(c, _):
            out = fn(*args_with(c))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32) * 0, leaf.reshape(-1)[0]

        def args_with(c):
            a0 = args[0] + c.astype(args[0].dtype)
            return (a0,) + args[1:]

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return outs

    jax.block_until_ready(many(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(many(*args))
        # floor at 10 us/iter: a wall at/below the RTT means the true cost
        # is unresolvable at this iters — report the floor, not 0
        best = min(best, max(0.01, (time.time() - t0) * 1e3 - rtt) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from bench import ring_projs
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        suggest_envelope,
        sweep_variance_pallas,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.regression import (
        regress_depth_and_confidence,
    )

    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((8,)) + 1), daemon=True
    ).start()

    V, H, W, D = 5, 864, 1152, 192
    h4, w4 = H // 4, W // 4
    K = np.array([[W * 1.1, 0, W / 2], [0, W * 1.1, H / 2], [0, 0, 1]], np.float32)
    projs = ring_projs(49, [0, 1, 48, 2, 47], 150.0, -700.0, 700.0, K / 4.0)
    dv = np.linspace(425, 905, D, dtype=np.float32)
    env = suggest_envelope(projs[1:], projs[0], dv, h4, w4)
    print("device:", jax.devices()[0].device_kind, "| envelope:", env, flush=True)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, V, H, W, 3).astype(np.float32))
    model = MVSNet(
        dtype=jnp.bfloat16, depth_chunk=48, use_pallas_regression=True,
        flat_features=True, flat_costreg=True,
        pallas_sweep_env=(env["yspan"], env["pr"], env["pcp"]),
    )
    proj = jnp.asarray(projs[None])
    dv_b = jnp.asarray(dv[None])
    variables = model.init(jax.random.PRNGKey(0), imgs, proj, dv_b)
    print("init done", flush=True)

    rows = {}

    # ---- whole forward (the bench.py number, same method) ----
    fwd = lambda im, pr, dvv: model.apply(variables, im, pr, dvv, train=False)[
        "depth"
    ]
    rows["forward"] = {"ms": sustained_ms(fwd, (imgs, proj, dv_b), iters=5)}
    print("forward:", rows["forward"], flush=True)

    # ---- stage: FeatureNet (B*V images at full res -> 1/4-res features) ----
    feat_method = lambda m, x, train: m.feature(x, train=train)
    imgs_flat = imgs.reshape(V, H, W, 3)

    def feat_fn(x):
        return model.apply(variables, x, False, method=feat_method)

    rows["featurenet"] = {"ms": sustained_ms(feat_fn, (imgs_flat,), iters=30)}
    # true conv MACs (reference FeatureNet topology, models/blocks.py):
    # per-layer 2*H*W*Cin*Cout*k*k at each of the 8 convs, x V images
    layer_cfg = [  # (h, w, cin, cout, k)
        (H, W, 3, 8, 3), (H, W, 8, 8, 3),
        (H // 2, W // 2, 8, 16, 5), (H // 2, W // 2, 16, 16, 3),
        (H // 2, W // 2, 16, 16, 3),
        (h4, w4, 16, 32, 5), (h4, w4, 32, 32, 3), (h4, w4, 32, 32, 3),
    ]
    feat_flops = 2 * V * sum(h * w * ci * co * k * k for h, w, ci, co, k in layer_cfg)
    rows["featurenet"]["true_gflop"] = round(feat_flops / 1e9, 1)
    rows["featurenet"]["bound"] = "MXU"
    rows["featurenet"]["bound_ms"] = round(feat_flops / MXU_BF16 * 1e3, 2)

    # ---- stage: fused Pallas sweep (feature res, D=192, 4 src views) ----
    feats = jnp.asarray(
        rng.rand(V, h4, w4, 32).astype(np.float32), jnp.bfloat16
    )
    sweep_fn = lambda f, p, d: sweep_variance_pallas(f, p, d, **env)[0]
    rows["sweep"] = {"ms": sustained_ms(
        sweep_fn, (feats, jnp.asarray(projs), jnp.asarray(dv))
    )}
    # VPU issue model: per (grid step = [8 rows x 128 px] x D) x view x
    # tap-row x channel-group: ~16 vector ops on (8,128) vregs in row_taps/
    # row_pass (2 window reads, 4 gathers, 2 selects, ~6 unpack bit-ops,
    # 2 mul + 2 fma), plus ~8 ops/step geometry & accumulate overhead.
    nYB, nXB = -(-h4 // 8), -(-w4 // 128)
    steps = nYB * nXB * D
    yspans = env["yspan"]
    vec_ops = steps * 8 * sum(ys * 2 * 16 for ys in yspans)
    rows["sweep"]["vreg_ops"] = int(vec_ops)
    rows["sweep"]["bound"] = "VPU"
    rows["sweep"]["bound_ms"] = round(vec_ops * (8 * 128) / VPU_OPS * 1e3, 2)
    # HBM floor for comparison: patches staged once per tile + variance out
    patch_bytes = 2 * (V - 1) * env["pr"] * 16 * env["pcp"] * 4 * nYB * nXB
    out_bytes = D * nYB * 8 * 32 * nXB * 128 * 2
    rows["sweep"]["hbm_floor_ms"] = round(
        (patch_bytes + out_bytes) / HBM_BPS * 1e3, 2
    )

    # ---- stage: CostRegNet flat U-Net ----
    vol = jnp.asarray(
        rng.rand(1, D, h4, w4, 32).astype(np.float32), jnp.bfloat16
    )
    costreg_method = lambda m, v, train: m.cost_regularization(v, train)

    def costreg_fn(v):
        return model.apply(variables, v, False, method=costreg_method)

    rows["costreg"] = {"ms": sustained_ms(costreg_fn, (vol,), iters=5)}
    # true 3D-conv MACs (reference CostRegNet topology: conv0..conv11)
    c3 = [  # (d, h, w, cin, cout) all k=3
        (D, h4, w4, 32, 8),
        (D // 2, h4 // 2, w4 // 2, 8, 16), (D // 2, h4 // 2, w4 // 2, 16, 16),
        (D // 4, h4 // 4, w4 // 4, 16, 32), (D // 4, h4 // 4, w4 // 4, 32, 32),
        (D // 8, h4 // 8, w4 // 8, 32, 64), (D // 8, h4 // 8, w4 // 8, 64, 64),
        # deconvs back up
        (D // 4, h4 // 4, w4 // 4, 64, 32), (D // 2, h4 // 2, w4 // 2, 32, 16),
        (D, h4, w4, 16, 8),
        (D, h4, w4, 8, 1),
    ]
    cr_flops = 2 * sum(d * h * w * ci * co * 27 for d, h, w, ci, co in c3)
    rows["costreg"]["true_gflop"] = round(cr_flops / 1e9, 1)
    rows["costreg"]["bound"] = "MXU"
    rows["costreg"]["bound_ms"] = round(cr_flops / MXU_BF16 * 1e3, 2)
    # HBM floor: the 764 MB bf16 variance volume is read once by conv0 and
    # the skip-connected tensors roughly double it
    vol_bytes = D * h4 * w4 * 32 * 2
    rows["costreg"]["hbm_floor_ms"] = round(3 * vol_bytes / HBM_BPS * 1e3, 2)

    # ---- stage: fused softmax regression ----
    cost = jnp.asarray(rng.rand(1, D, h4, w4).astype(np.float32))

    def reg_fn(c, d):
        return regress_depth_and_confidence(c, d, use_pallas=True)

    rows["regression"] = {"ms": sustained_ms(reg_fn, (cost, dv_b), iters=100)}
    reg_bytes = D * h4 * w4 * 4  # one f32 volume read dominates
    rows["regression"]["bound"] = "HBM"
    rows["regression"]["bound_ms"] = round(2 * reg_bytes / HBM_BPS * 1e3, 2)

    # ---- summary ----
    stage_sum = sum(rows[s]["ms"] for s in ("featurenet", "sweep", "costreg",
                                            "regression"))
    fwd_ms = rows["forward"]["ms"]
    true_flops = feat_flops + cr_flops
    mfu = true_flops / (fwd_ms / 1e3) / MXU_BF16
    print("\nstage          ms      bound  bound_ms  % of bound")
    for s in ("featurenet", "sweep", "costreg", "regression"):
        r = rows[s]
        pct = r["bound_ms"] / r["ms"] * 100
        print(f"{s:12s} {r['ms']:7.2f}  {r['bound']:5s} {r['bound_ms']:8.2f}"
              f"  {pct:8.1f}%")
        r["pct_of_bound"] = round(pct, 1)
        r["ms"] = round(r["ms"], 2)
    print(f"forward      {fwd_ms:7.2f}   (stage sum {stage_sum:.2f} -> "
          f"fusion/overlap gap {fwd_ms - stage_sum:+.2f})")
    print(f"whole-forward true-MAC MFU: {mfu:.1%} "
          f"(true conv FLOPs {true_flops / 1e9:.0f} G / {fwd_ms:.1f} ms; "
          f"the sweep+regression stages are not MXU work)")
    rows["forward"]["ms"] = round(fwd_ms, 2)
    rows["summary"] = {
        "stage_sum_ms": round(stage_sum, 2),
        "true_mxu_gflop": round(true_flops / 1e9, 1),
        "whole_forward_mfu": round(mfu, 4),
    }
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
