#!/usr/bin/env python
"""Benchmark: depth-map inference throughput on the flagship config.

Prints ONE JSON line:
  {"metric": "depthmaps_per_sec_per_chip", "value": N, "unit": "depthmaps/s",
   "vs_baseline": N, ...}

Config: the BASELINE.md headline — 5 views, 192 depth planes, 864x1152
images (feature/depth res 216x288), batch 1, single chip. The rig is an
inward-looking camera ring (rotation-bearing, like the real DTU/BDS8
acquisition geometry) — NOT the gather-friendliest translation-only rig;
rotations are what stress the sweep kernel's window planner. vs_baseline
is the ratio to the PyTorch reference measured on this container's CPU
(baseline_cpu.json, produced by scripts/measure_baseline.py; the reference
publishes no numbers — BASELINE.md).
"""

import json
import os
import time

import numpy as np

V, H, W, D = 5, 864, 1152, 192
WARMUP = 2
ITERS = 20


def _look_at(eye, target, up=(0, 1, 0)):
    eye = np.asarray(eye, np.float64)
    z = np.asarray(target, np.float64) - eye
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    E = np.eye(4)
    R = np.stack([x, y, z])
    E[:3, :3] = R
    E[:3, 3] = -R @ eye
    return E.astype(np.float32)


def ring_projs(n_cams, views, radius, height, target_z, K):
    """Feature-res projection matrices for `views` of an n_cams inward ring
    (the DTU/BDS8 overhead acquisition geometry; scripts/bench_configs.py
    measures the full rig family)."""
    projs = []
    for i in views:
        a = 2 * np.pi * i / n_cams
        eye = (radius * np.cos(a), radius * np.sin(a), height)
        E = _look_at(eye, (0.0, 0.0, target_z))
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        projs.append(P)
    return np.stack(projs)


def main():
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    # async D2H channel warmup (see eval/depth_gen.py): the tunnel's lazy
    # first-materialize cost (31-130+ s, ~32 s epochs) must not land inside
    # the timed iterations; start it now, overlapped with envelope planning
    # and the model compile
    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((8,)) + 1), daemon=True
    ).start()

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, V, H, W, 3).astype(np.float32))
    # reference camera 0 of a 49-camera inward ring + its 4 nearest ring
    # neighbours (the DTU eval pairing), intrinsics at feature res (K/4)
    K = np.array([[W * 1.1, 0, W / 2], [0, W * 1.1, H / 2], [0, 0, 1]], np.float32)
    projs = ring_projs(49, [0, 1, 48, 2, 47], 150.0, -700.0, 700.0, K / 4.0)
    proj = jnp.asarray(projs[None])
    dv = jnp.asarray(np.linspace(425, 905, D, dtype=np.float32)[None])

    # Fused Pallas plane-sweep variance kernel: window envelope planned per
    # rig on the host (one compile per envelope); falls back to the XLA
    # sweep in-graph if a sample exceeds it (ops/pallas/sweep_variance.py).
    sweep_env = None
    if on_tpu:
        from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
            suggest_envelope,
        )

        env = suggest_envelope(
            projs[1:], projs[0], np.asarray(dv[0]), H // 4, W // 4
        )
        sweep_env = (env["yspan"], env["pr"], env["pcp"])

    # depth_chunk=48 keeps the XLA fallback sweep's footprint buffers
    # streamed in 4 depth chunks (the full-D XLA sweep needs ~34 GB vs
    # 16 GB HBM at this resolution); the fused kernel never materializes
    # them at all.
    model = MVSNet(
        dtype=jnp.bfloat16 if on_tpu else None,
        depth_chunk=48 if on_tpu else None,
        use_pallas_regression=on_tpu,
        flat_features=on_tpu,
        flat_costreg=on_tpu,
        pallas_sweep_env=sweep_env,
    )

    variables = model.init(jax.random.PRNGKey(0), imgs, proj, dv)

    @jax.jit
    def fwd(variables, imgs, proj, dv):
        out = model.apply(variables, imgs, proj, dv, train=False)
        return out["depth"], out["photometric_confidence"]

    # Measurement notes for the remote-TPU tunnel (axon):
    #  - a result fetch costs ~27 ms RTT and block_until_ready does not block,
    #  - each python-dispatched jit call pays ~1 RTT of client overhead, so
    #    per-call timing overstates device time by ~25% at this config.
    # Method: run ITERS sustained iterations INSIDE one jit via lax.scan —
    # the carry perturbs the input every step (no caching/CSE) and depends
    # on each output (no dead-code elimination) — and subtract the measured
    # one-per-dispatch RTT from each rep's wall (rounds 1-4 left RTT/ITERS
    # inside the number: ~+5.9% at ITERS=5). This measures sustained device
    # throughput, which is the depthmaps/sec/chip the metric names; the
    # reference CPU baseline is likewise free of client RTT.
    @jax.jit
    def sustained(variables, imgs, proj, dv):
        def body(c, _):
            d, conf = fwd(variables, imgs + c, proj, dv)
            return c + d.reshape(-1)[0] * 0, d.reshape(-1)[0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs

    float(jnp.sum(sustained(variables, imgs, proj, dv)))  # compile + warm
    noop = jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0.0)))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(noop(jnp.float32(t0 % 1.0)))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[2]
    best = float("inf")
    for _ in range(max(2, WARMUP)):
        t0 = time.time()
        float(jnp.sum(sustained(variables, imgs, proj, dv)))
        best = min(best, max(0.0, time.time() - t0 - rtt) / ITERS)
    sec = best
    throughput = 1.0 / sec

    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baseline_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        ref = base.get("headline_5v_192d_864x1152", {}).get("depthmaps_per_sec")
        if ref:
            vs_baseline = throughput / ref

    print(json.dumps({
        "metric": "depthmaps_per_sec_per_chip",
        "value": round(throughput, 4),
        "unit": "depthmaps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "config": f"{V} views (49-cam ring), {D} planes, {H}x{W}, batch 1, "
                  f"{'bf16' if on_tpu else 'f32'} convs",
        # rig identity: r01/r02 benched a translation-only rig; r03+ bench
        # the harder rotation-bearing inward ring (per-round numbers are
        # only comparable within the same rig value)
        "rig": "rotation_ring49",
        "seconds_per_depthmap": round(sec, 4),
        # r05 method fix: the one-per-dispatch tunnel RTT (measured, ~27 ms)
        # is now subtracted from each rep's wall; rounds 1-4 amortized it
        # over ITERS=5 (~+5.9% inflation of seconds_per_depthmap)
        "timing": f"{ITERS} iters/dispatch, RTT {rtt * 1e3:.0f} ms subtracted",
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
