#!/usr/bin/env python
"""End-to-end eval wall clock: files in -> PLY out, stages A + B, through
the real eval.py CLI on a synthetic scene tree (VERDICT round-2 item 4 —
the device-sustained bench.py number excludes host decode/IO; this is the
number a user feels).

Comparable reference surface: /root/reference/eval.py:283-843 (save_depth +
filter_depth over a scan). Configs:
  dtu_full — 49-view scan at 864x1152, 192 planes, NviewGen 5,
             NviewFilter 10 (the BASELINE.md headline geometry)
  bin      — 4-view rig at 512x640, 192 planes, NviewGen 4, NviewFilter 3

Writes bench_e2e.json next to bench_configs.json and prints one JSON line
per config: stage A wall, stage B wall, total, views/s end-to-end.

Run on the TPU host:  python scripts/bench_e2e_eval.py [--views 49]
(--views trims the dtu_full scan for faster iterations; the recorded
BASELINE.md row uses the full 49.)
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_tree(root: str, n_views: int, hw, ndepths: int, n_scans: int = 1,
               ring: bool = False):
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        RingRig, SyntheticRig, make_eval_tree, write_scan_list,
    )

    if ring:
        # inward 49-cam ring — the BDS8 acquisition geometry
        # (rotation-bearing extrinsics: per-view yspan envelopes, the
        # sweep kernel's hard case)
        rig = RingRig(n_views=n_views, img_hw=hw, z0=700.0, slope_x=0.05,
                      radius=150.0, height=-700.0, focal=1.1 * hw[1])
    else:
        rig = SyntheticRig(n_views=n_views, img_hw=hw, baseline=2.0,
                           z0=500.0, slope_x=0.15, focal=0.8 * hw[1])
    scans = [f"scan{i + 1}" for i in range(n_scans)]
    for scan in scans:
        make_eval_tree(root, scan=scan, rig=rig, ndepths=ndepths)
    write_scan_list(os.path.join(root, "test.txt"), scans)
    return rig


def make_ckpt(logdir: str) -> str:
    """Random-init checkpoint for the bench, created in a CPU SUBPROCESS:
    the tiny model.init does not need (or deserve) a TPU round-trip — on a
    degraded tunnel it has been observed to hang for minutes, while on CPU
    it is ~5 s. Orbax checkpoints are device-portable (verify skill)."""
    import subprocess
    import sys as _sys

    code = (
        "import jax, jax.numpy as jnp;"
        "from scene_3dreconstruction_mvsnet_tpu.models import MVSNet;"
        "from scene_3dreconstruction_mvsnet_tpu.train import ("
        "TrainState, make_optimizer, save_checkpoint);"
        "model = MVSNet();"
        "variables = model.init(jax.random.PRNGKey(0),"
        "jnp.zeros((1, 2, 64, 96, 3)),"
        "jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),"
        "jnp.linspace(1.0, 2.0, 16)[None]);"
        "state = TrainState.create(variables, make_optimizer(lambda s: 1e-3));"
        f"print(save_checkpoint({logdir!r}, 0, state))"
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT
    proc = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    if proc.returncode != 0:
        raise SystemExit(f"make_ckpt failed: {proc.stderr[-2000:]}")
    return proc.stdout.strip().splitlines()[-1]


def run_config(name, n_views, hw, ngen, nfilter, ckpt, workdir,
               batch_size, extra, n_scans=1, ring=False, second_run=False):
    H, W = hw
    root = os.path.join(workdir, f"acq_{name}")
    t0 = time.time()
    build_tree(root, n_views, hw, ndepths=192, n_scans=n_scans, ring=ring)
    t_fixture = time.time() - t0

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # pre-decoded image cache: each of the scan's images is read ~NviewGen
    # times (once as ref, repeatedly as source); decode once, mmap after.
    # The AOT executable cache lives under it (eval.py default), so the
    # second_run process skips the jit compile entirely.
    img_cache = os.path.join(workdir, f"imgcache_{name}")

    def one_run(outdir):
        cmd = [
            sys.executable, os.path.join(repo, "eval.py"),
            "--dataset", "dataloader_eval", "--dataset_name", "bds8",
            "--testpath", root, "--testlist", os.path.join(root, "test.txt"),
            "--loadckpt", ckpt, "--outdir", outdir,
            "--NviewGen", str(ngen), "--NviewFilter", str(nfilter),
            "--numdepth", "192", "--interval_scale", "1.0",
            "--photomask", "0.3", "--geomask", "3",
            "--condmask_pixel", "1.0", "--condmask_depth", "0.01",
            "--save_ply", "--batch_size", str(batch_size),
            "--num_workers", "4", "--img_cache", img_cache,
            "--img_res", str(H), str(W),
            "--cam_subfolder", "Cameras",
            "--img_subfolder", "Rectified/{}/rect_C{:0>3}_L00.png",
        ] + extra
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        total = time.time() - t0
        if proc.returncode != 0:
            print(proc.stdout[-4000:], proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"{name}: eval.py failed")

        def grab(pat):
            m = re.search(pat, proc.stdout)
            return float(m.group(1)) if m else None

        phases_str = (
            re.search(r"stage A phases \(s\): (.*)", proc.stdout).group(1)
            if re.search(r"stage A phases \(s\): ", proc.stdout) else None
        )
        phases = {}
        if phases_str:
            for kv in phases_str.split():
                k, _, v = kv.partition("=")
                try:
                    phases[k] = phases.get(k, 0.0) + float(v)
                except ValueError:
                    pass
        res = {
            "stage_a_wall_s": grab(r"stage A wall: ([\d.]+)s"),
            "stage_b_wall_s": grab(r"stage B wall: ([\d.]+)s"),
            "pipeline_wall_s": grab(r"total wall: ([\d.]+)s"),
            "proc_wall_s": round(total, 2),  # includes interpreter + jax init
            "steady_gen_s_per_view": grab(r"\"steady_gen_time\": ([\d.]+)")
            or grab(r"Averaged generation time: ([\d.]+)"),
            "device_busy_pct": grab(r"stage A = ([\d.]+)%"),
            # The axon tunnel's lazy D2H channel setup: per-process,
            # 30-300 s variance, NOT a property of this code (root cause in
            # docs/ROUND4_NOTES.md). The warmup thread fronts it at stage A
            # entry, overlapped with setup; 'd2h_channel_setup_s' is its
            # total duration, 'd2h_exposed_s' the part that still blocked
            # the pipeline (the d2h_warmup phase). Both default 0.0 when the
            # channel came up in <1 s (healthy window).
            "d2h_channel_setup_s": grab(r"d2h channel warmup: ([\d.]+)s") or 0.0,
            "d2h_exposed_s": round(phases.get("d2h_warmup", 0.0), 2),
            "stage_a_phases": phases_str,
            "views": n_views * n_scans,
            "config": f"{n_scans}x{n_views} views {H}x{W} D192 gen{ngen} "
                      f"filt{nfilter} bs{batch_size}",
        }
        if res["pipeline_wall_s"]:
            # pipeline work = wall minus the exposed infrastructure draw —
            # the number comparable across rounds/windows (the canonical
            # BASELINE.md e2e metric); views/s on both for a naive reader
            work = max(0.0, res["pipeline_wall_s"] - res["d2h_exposed_s"])
            res["pipeline_work_s"] = round(work, 2)
            res["views_per_s_end_to_end"] = round(
                n_views * n_scans / res["pipeline_wall_s"], 3
            )
            if work > 0:
                res["views_per_s_pipeline_work"] = round(
                    n_views * n_scans / work, 3
                )
        return res

    res = one_run(os.path.join(workdir, f"out_{name}"))
    res["fixture_gen_s"] = round(t_fixture, 2)
    print(json.dumps({name: res}))
    if second_run:
        # warm-serving row: fresh PROCESS, warm img + AOT executable caches
        # — the repeat-scan serving cost (VERDICT r3 item 2's 'second
        # process cold start')
        res2 = one_run(os.path.join(workdir, f"out_{name}_warm"))
        res["warm_process"] = res2
        print(json.dumps({f"{name}_warm": res2}))
    return res


def run_serve(name, n_views, hw, ngen, nfilter, ckpt, workdir,
              batch_size, extra, n_scans):
    """Serving row: ONE long-lived eval.py --serve process, scan requests
    streamed over stdin (VERDICT r4 item 6). Reports sustained views/s
    (excluding the first request, which carries compile + channel setup)."""
    H, W = hw
    root = os.path.join(workdir, f"acq_{name}")
    build_tree(root, n_views, hw, ndepths=192, n_scans=n_scans)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img_cache = os.path.join(workdir, f"imgcache_{name}")
    cmd = [
        sys.executable, os.path.join(repo, "eval.py"),
        "--dataset", "dataloader_eval", "--dataset_name", "bds8",
        "--testpath", root, "--loadckpt", ckpt,
        "--outdir", os.path.join(workdir, f"out_{name}"),
        "--NviewGen", str(ngen), "--NviewFilter", str(nfilter),
        "--numdepth", "192", "--interval_scale", "1.0",
        "--photomask", "0.3", "--geomask", "3",
        "--condmask_pixel", "1.0", "--condmask_depth", "0.01",
        "--save_ply", "--batch_size", str(batch_size),
        "--num_workers", "4", "--img_cache", img_cache,
        "--img_res", str(H), str(W),
        "--cam_subfolder", "Cameras",
        "--img_subfolder", "Rectified/{}/rect_C{:0>3}_L00.png",
        "--serve",
    ] + extra
    requests = "".join(f"scan{i + 1}\n" for i in range(n_scans)) + "quit\n"
    t0 = time.time()
    proc = subprocess.run(cmd, input=requests, capture_output=True, text=True,
                          timeout=3600)
    total = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:], proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"{name}: eval.py --serve failed")
    m = re.search(r"SERVE summary: (\{.*\})", proc.stdout)
    summary = json.loads(m.group(1)) if m else {}
    dm = re.search(r"d2h channel warmup: ([\d.]+)s", proc.stdout)
    res = {
        "mode": "serve",
        "config": f"{n_scans} scan requests x {n_views} views {H}x{W} D192 "
                  f"gen{ngen} filt{nfilter} bs{batch_size}, one process",
        "proc_wall_s": round(total, 2),
        "d2h_channel_setup_s": float(dm.group(1)) if dm else 0.0,
        **summary,
    }
    print(json.dumps({name: res}))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=49,
                    help="views in the dtu_full scan (49 = BASELINE row)")
    ap.add_argument("--configs", nargs="*",
                    default=["dtu_full", "bds8_ring", "bin", "multi_bin",
                             "serve"])
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: tempdir, removed)")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="bench_e2e_")
    ckpt = make_ckpt(os.path.join(workdir, "log"))

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    fast = ([
        "--dtype", "bfloat16", "--pallas_sweep", "--use_pallas",
        "--flat_features", "--flat_costreg",
    ] if on_tpu else [])

    results = {}
    if "dtu_full" in args.configs:
        # batch 1 at 864x1152: the batched (bs2) stage A needs ~2x the
        # fallback-branch warp buffers and exceeds 16 GB HBM at this res
        # (measured OOM); bs2 is exercised at 512x640 by the bin config.
        results[f"dtu_full_{args.views}v_e2e"] = run_config(
            "dtu_full", args.views, (864, 1152), 5, 10, ckpt, workdir,
            batch_size=1, extra=fast, second_run=True,
        )
    if "bds8_ring" in args.configs:
        # BDS8 49-camera inward ring at 512x640 (BASELINE config 3; the
        # eval_BlenderDS preset runs gen5/filt10 with photomask 0.5 —
        # /root/reference/.vscode/launch.json + eval.py:851-895)
        results["bds8_ring_49v_e2e"] = run_config(
            "bds8_ring", 49, (512, 640), 5, 10, ckpt, workdir,
            batch_size=2 if on_tpu else 1, extra=fast, ring=True,
        )
    if "bin" in args.configs:
        results["bin_4cam_e2e"] = run_config(
            "bin", 4, (512, 640), 4, 3, ckpt, workdir,
            batch_size=2 if on_tpu else 1, extra=fast, second_run=True,
        )
    if "multi_bin" in args.configs:
        # 6 scans of the bin rig through ONE eval.py process: stage B of
        # finished scans overlaps stage A of later ones, and the jit
        # compile + ckpt load amortize across scans — the production
        # serving shape (a camera rig imaging a stream of bins)
        results["bin_6scan_e2e"] = run_config(
            "multi_bin", 4, (512, 640), 4, 3, ckpt, workdir,
            batch_size=2 if on_tpu else 1, extra=fast, n_scans=6,
        )

    if "serve" in args.configs:
        # serving row (VERDICT r4 item 6): 10 scan requests into ONE
        # long-lived process — sustained views/s excludes request 1
        # (compile + channel setup); target >= 2x the single-scan rate
        results["bin_serve_10scan"] = run_serve(
            "serve", 4, (512, 640), 4, 3, ckpt, workdir,
            batch_size=2 if on_tpu else 1, extra=fast, n_scans=10,
        )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "bench_e2e.json")
    merged = {}
    if os.path.exists(out):  # partial runs update only their own rows
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results))
    if not args.keep:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
