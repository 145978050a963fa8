#!/usr/bin/env python
"""End-to-end TRAINING wall clock: real input pipeline -> jitted train
step, through the real train.py CLI on a synthetic DTU-format tree
(VERDICT round-3 item 3 — bench_train_step.py times the device step only;
this is the number an epoch actually costs, host decode + collate + u8
pack + transfer included).

Comparable reference surface: the epoch loop at
/root/reference/train.py:157-224 with the shipped DTU recipe
(scripts/train_DTU.sh: batch 4, N=3 views, D192). The synthetic scan is
DTU-layout (Rectified/ 7-light PNGs, Depths/ quarter-res PFMs + masks,
Cameras/train cam files) so the real dtu_yao loader runs.

Runs TWO epochs in one process: epoch 0 is cold (jit compile + cold image
cache), epoch 1 is the steady-state row. Prints one JSON line per run and
writes/updates bench_train_e2e.json at the repo root. A --device-probe run
of the sustained device step (scripts/bench_train_step.py semantics) gives
the host/device split.

Run on the TPU host:  python scripts/bench_train_e2e.py
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_tree(root: str, n_views: int, ndepths: int):
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        SyntheticRig,
        make_dtu_tree,
        write_scan_list,
    )

    rig = SyntheticRig(n_views=n_views, img_hw=(512, 640), baseline=2.0,
                       z0=500.0, slope_x=0.15, focal=512.0)
    make_dtu_tree(root, scan="scan1", rig=rig, ndepths=ndepths)
    write_scan_list(os.path.join(root, "train.txt"), ["scan1"])
    write_scan_list(os.path.join(root, "test.txt"), ["scan1"])
    return rig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=16,
                    help="rig views; the dtu_yao loader builds one meta per "
                         "(view, light) with all 7 lights (reference "
                         "dtu_yao.py:39), so samples/epoch = 7 x views")
    ap.add_argument("--batch_size", type=int, default=4,
                    help="the shipped DTU recipe trains at batch 4 "
                         "(reference scripts/train_DTU.sh)")
    ap.add_argument("--epochs", type=int, default=2,
                    help="epoch 0 = cold (compile), epoch 1 = steady row")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--no_device_probe", action="store_true",
                    help="skip the device-only sustained-step probe "
                         "(host/device split)")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="bench_train_e2e_")
    root = os.path.join(workdir, "dtu")
    t0 = time.time()
    build_tree(root, args.views, ndepths=192)
    t_fixture = time.time() - t0

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    fast = ([
        "--dtype", "bfloat16", "--pallas_sweep", "--pallas_grad",
        "--flat_features", "--flat_costreg", "--pallas_regression",
    ] if on_tpu else [])

    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--mode", "train", "--dataset", "dtu_yao",
        "--trainpath", root, "--testpath", root,
        "--trainlist", os.path.join(root, "train.txt"),
        "--testlist", os.path.join(root, "test.txt"),
        "--epochs", str(args.epochs), "--batch_size", str(args.batch_size),
        "--numdepth", "192", "--interval_scale", "1.06",
        "--NtrainViews", "3", "--NtestViews", "3",
        "--lr", "0.001", "--lrepochs", "10,12,14:2",
        "--logdir", os.path.join(workdir, "log"),
        "--summary_freq", "100", "--save_freq", "100",  # no mid-bench ckpt
        "--seed", "1", "--num_workers", "4",
        "--img_cache", os.path.join(workdir, "imgcache"),
    ] + fast
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    proc_wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:], proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit("train.py failed")

    epochs = re.findall(
        r"epoch (\d+) train wall: ([\d.]+)s \((\d+) samples, ([\d.]+) "
        r"samples/s end-to-end\)", proc.stdout)
    rows = {
        int(e): {"wall_s": float(w), "samples": int(n), "samples_per_s": float(s)}
        for e, w, n, s in epochs
    }
    if not rows:
        print(proc.stdout[-3000:], file=sys.stderr)
        raise SystemExit("no epoch wall lines found")

    steady = rows.get(max(rows))
    m = re.search(r"d2h channel warmup: ([\d.]+)s", proc.stdout)
    res = {
        "config": f"DTU recipe bs{args.batch_size} 3v 512x640 D192 "
                  f"{'bf16+pallas' if on_tpu else 'f32 cpu'}",
        "epoch0_cold": rows.get(0),
        "steady_epoch": steady,
        "steady_s_per_step": round(
            steady["wall_s"] / max(1, steady["samples"] // args.batch_size), 4
        ),
        "proc_wall_s": round(proc_wall, 2),
        "fixture_gen_s": round(t_fixture, 2),
        # the axon relay's per-process D2H channel setup (infra, labeled on
        # every row like bench_e2e.json; 0.0 = healthy window)
        "d2h_channel_setup_s": float(m.group(1)) if m else 0.0,
    }

    if on_tpu and not args.no_device_probe:
        # host/device split: sustained DEVICE-ONLY step at the same batch
        # (lax.scan over the real state carry, no input pipeline) in a
        # fresh process; host share = 1 - device/steady
        probe = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/bench_train_step.py"),
             "--batch", str(args.batch_size), "--flat", "--sustained"],
            capture_output=True, text=True, timeout=1800,
        )
        pm = re.search(r"sustained .*: ([\d.]+) s/step", probe.stdout)
        if probe.returncode == 0 and pm:
            dev = float(pm.group(1))
            res["device_s_per_step"] = round(dev, 4)
            res["host_share"] = round(1 - dev / res["steady_s_per_step"], 4)
        else:
            res["device_s_per_step"] = None
            print("device probe failed:", probe.stdout[-1500:],
                  probe.stderr[-500:], file=sys.stderr)
    print(json.dumps({"train_e2e": res}))

    out = os.path.join(REPO, "bench_train_e2e.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged[f"bs{args.batch_size}"] = res
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    if not args.keep:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
