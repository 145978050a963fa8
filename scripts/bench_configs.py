"""Benchmark the remaining BASELINE.json measurement configs on TPU.

Configs (BASELINE.md):
  1. dtu_small  — 3 views, 512x640 imgs, 96 planes (translation rig)
  2. dtu_full   — 5 views, 864x1152 imgs, 192 planes + stage-B filtering
  3. bds8_ring  — 49-camera inward-looking ring rig (rotation-bearing),
                  5-view depth generation at 512x640, 192 planes
  4. bin_rig    — 4 low-cost B&W cameras (inward ring), 512x640, 192 planes

Prints one JSON line per config. Forward throughput is the sustained
in-jit scan (bench.py methodology); the filter number is the whole-scan
single-launch filter averaged per reference view.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def look_at(eye, target, up=(0, 1, 0)):
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


def ring_rig(n_cams, radius, height, target_z, K):
    """Inward-looking camera ring (the BDS8/bin overhead geometry)."""
    projs = []
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        eye = (radius * np.cos(a), radius * np.sin(a), height)
        E = look_at(eye, (0.0, 0.0, target_z))
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        projs.append(P)
    return np.stack(projs)


def translation_rig(n_cams, baseline, K):
    projs = []
    for v in range(n_cams):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = -baseline * v
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        projs.append(P)
    return np.stack(projs)


def bench_forward(name, V, H, W, D, projs, dv, iters=20, warmup=2):
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        suggest_envelope,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    h4, w4 = H // 4, W // 4
    sweep_env = None
    if on_tpu:
        env = suggest_envelope(projs[1:V], projs[0], dv, h4, w4)
        sweep_env = (env["yspan"], env["pr"], env["pcp"])
        print(f"[{name}] envelope: {env}", file=sys.stderr)

    model = MVSNet(
        dtype=jnp.bfloat16 if on_tpu else None,
        depth_chunk=48 if (on_tpu and D % 48 == 0) else None,
        use_pallas_regression=on_tpu,
        flat_features=on_tpu,
        flat_costreg=on_tpu,
        pallas_sweep_env=sweep_env,
    )
    rng = np.random.RandomState(0)
    imgs = rng.rand(1, V, H, W, 3).astype(np.float32)
    proj = jnp.asarray(projs[None, :V])
    dv_j = jnp.asarray(dv[None])
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs), proj, dv_j)

    import jax as _jax

    # sustained in-jit scan (same methodology as bench.py): per-call
    # dispatch over the remote-TPU tunnel pays ~27 ms client RTT that is
    # not chip time — at the small configs that would halve the number
    @_jax.jit
    def sustained(variables, imgs, proj, dv):
        def body(c, _):
            out = model.apply(variables, imgs + c, proj, dv, train=False)
            d = out["depth"]
            return c + d.reshape(-1)[0] * 0, d.reshape(-1)[0]
        _, outs = _jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return outs

    imgs_d = _jax.device_put(jnp.asarray(imgs))
    float(jnp.sum(sustained(variables, imgs_d, proj, dv_j)))  # compile+warm
    # r05 method fix (same as bench.py): measure the one-per-dispatch
    # tunnel RTT with a noop jit and subtract it from each rep's wall —
    # amortizing it over iters=5 left ~+27ms/5 inside the small configs
    noop = _jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0.0)))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(noop(jnp.float32(t0 % 1.0)))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[2]
    best = float("inf")
    for _ in range(max(2, warmup)):
        t0 = time.time()
        float(jnp.sum(sustained(variables, imgs_d, proj, dv_j)))
        best = min(best, max(0.0, time.time() - t0 - rtt) / iters)
    return best


def bench_filter(name, n_views, H, W, projs, n_src, iters=3):
    """Whole-scan single-launch filter, averaged per reference view."""
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_scan

    h4, w4 = H // 4, W // 4
    rng = np.random.RandomState(0)
    depths = rng.uniform(425, 905, (n_views, h4, w4)).astype(np.float32)
    confs = rng.rand(n_views, h4, w4).astype(np.float32)
    pair_data = [
        (r, [s for s in range(n_views) if s != r][:n_src]) for r in range(n_views)
    ]
    # `projs` here are plain extrinsics (ring_rig with K = I)
    K = np.array([[0.7 * w4, 0, w4 / 2], [0, 0.7 * w4, h4 / 2], [0, 0, 1]], np.float32)
    Ks = np.stack([K] * n_views)
    Es = np.stack([projs[i] for i in range(n_views)])
    fuse_scan(  # compile
        depths, confs, Ks, Es, pair_data, list(range(n_views)),
        NviewFilter=n_src, photomask=0.5, geomask=2,
    )
    t0 = time.time()
    for _ in range(iters):
        fuse_scan(
            depths, confs, Ks, Es, pair_data, list(range(n_views)),
            NviewFilter=n_src, photomask=0.5, geomask=2,
        )
    per_view = (time.time() - t0) / iters / n_views
    return per_view


def main():
    results = {}

    # config 1: DTU small
    H, W, D, V = 512, 640, 96, 3
    K = np.array([[W * 0.7, 0, W / 8], [0, W * 0.7, H / 8], [0, 0, 1]], np.float32)
    projs = translation_rig(V, 2.0, K / 4.0)
    dv = np.linspace(425, 905, D).astype(np.float32)
    sec = bench_forward("dtu_small", V, H, W, D, projs, dv)
    results["dtu_small_3v_96d_512x640"] = {"sec_per_depthmap": round(sec, 4)}

    # config 2: DTU full (headline fwd measured by bench.py) + filtering
    H, W, D, V = 864, 1152, 192, 5
    K = np.array([[W * 0.7, 0, W / 8], [0, W * 0.7, H / 8], [0, 0, 1]], np.float32)
    projs = translation_rig(V, 2.0, K / 4.0)
    dv = np.linspace(425, 905, D).astype(np.float32)
    sec = bench_forward("dtu_full", V, H, W, D, projs, dv)
    # stage-B: 49 saved views, 10 source views each (DTU NviewFilter)
    ext_ring = ring_rig(49, 50.0, -600.0, 600.0, np.eye(3, dtype=np.float32))
    filt = bench_filter("dtu_full_filter", 49, H, W, ext_ring, n_src=10)
    results["dtu_full_5v_192d_864x1152"] = {
        "sec_per_depthmap": round(sec, 4),
        "filter_sec_per_view": round(filt, 4),
    }

    # config 3: BDS8 49-camera ring, 5-view generation
    H, W, D, V = 512, 640, 192, 5
    K = np.array([[W * 1.1, 0, W / 2], [0, W * 1.1, H / 2], [0, 0, 1]], np.float32)
    ring = ring_rig(49, 150.0, -700.0, 700.0, K / 4.0)
    # generation uses a reference camera and its 4 nearest ring neighbours
    projs = ring[[0, 1, 48, 2, 47]]
    dv = np.linspace(425, 905, D).astype(np.float32)
    sec = bench_forward("bds8_ring", V, H, W, D, projs, dv)
    filt = bench_filter("bds8_filter", 49, H, W, ring_rig(49, 150.0, -700.0, 700.0, np.eye(3, dtype=np.float32)), n_src=10)
    results["bds8_49cam_5v_192d_512x640"] = {
        "sec_per_depthmap": round(sec, 4),
        "filter_sec_per_view": round(filt, 4),
    }

    # config 4: bin 4-camera rig
    H, W, D, V = 512, 640, 192, 4
    ring = ring_rig(4, 120.0, -650.0, 650.0, K / 4.0)
    projs = ring
    sec = bench_forward("bin_rig", V, H, W, D, projs, dv)
    filt = bench_filter("bin_filter", 4, H, W, ring_rig(4, 120.0, -650.0, 650.0, np.eye(3, dtype=np.float32)), n_src=3)
    results["bin_4cam_4v_192d_512x640"] = {
        "sec_per_depthmap": round(sec, 4),
        "filter_sec_per_view": round(filt, 4),
    }

    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "bench_configs.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
