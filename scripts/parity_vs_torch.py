#!/usr/bin/env python
"""One-command weight-parity harness vs the PyTorch reference.

When a real released checkpoint lands, validation is a single step:

    python scripts/parity_vs_torch.py --ckpt model_000015.ckpt \
        --data /path/to/eval_tree --testlist /path/to/test.txt \
        [--dataset_name dtu ... eval.py registry knobs]

It runs BOTH full pipelines on the same tree with the same weights —
the reference /root/reference/eval.py (CPU torch; open3d/plyfile stubbed,
.cuda() neutralized) and our eval.py (which loads torch .ckpt files
directly via interop/torch_import.py, byte-exact mapping tested in
tests/test_interop_file.py) — then prints per-view mean/max abs depth
delta, confidence delta, and mask IoU, and a PASS/FAIL verdict against the
BASELINE north star (<1 mm mean abs depth delta; checkpoint format
/root/reference/train.py:192-197).

With --synthetic it builds the in-container stand-in (synthetic tree +
random-init weights exported to the torch format) and proves the harness
end-to-end — the same machinery tests/test_reference_ab.py pins in CI.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# Headless reference runner: stub packages missing from this container
# (open3d/plyfile are viz / --save_ply only, both off here), no-op .cuda().
_REF_WRAPPER = r"""
import sys, types, runpy
import torch

o3d = types.ModuleType("open3d")
o3d.geometry = types.SimpleNamespace()
o3d.utility = types.SimpleNamespace()
o3d.visualization = types.SimpleNamespace()
sys.modules["open3d"] = o3d
ply = types.ModuleType("plyfile")
ply.PlyData = object
ply.PlyElement = object
sys.modules["plyfile"] = ply
tv = types.ModuleType("torchvision")
tvu = types.ModuleType("torchvision.utils")
tv.utils = tvu
sys.modules["torchvision"] = tv
sys.modules["torchvision.utils"] = tvu

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

sys.path.insert(0, "/root/reference")
sys.argv = ["eval.py"] + sys.argv[1:]
runpy.run_path("/root/reference/eval.py", run_name="__main__")
"""


def make_synthetic(workdir: str):
    """Synthetic stand-in: eval tree + random-init weights in torch format."""
    import numpy as np
    import torch

    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        SyntheticRig, make_eval_tree, write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.interop import export_torch_state_dict
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet

    root = os.path.join(workdir, "acq")
    rig = SyntheticRig(n_views=4, img_hw=(512, 640), baseline=3.0, focal=600.0)
    make_eval_tree(root, scan="scan1", rig=rig, ndepths=16)
    write_scan_list(os.path.join(root, "test.txt"), ["scan1"])
    os.symlink(os.path.join(root, "Cameras"),
               os.path.join(root, "Cameras_512x640"))
    os.symlink(os.path.join(root, "Rectified"),
               os.path.join(root, "Rectified_512x640"))

    import jax
    import jax.numpy as jnp

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    sd = export_torch_state_dict(variables)
    ckpt = os.path.join(workdir, "model_000000.ckpt")
    torch.save(
        {"epoch": 0,
         "model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        ckpt,
    )
    return ckpt, root, os.path.join(root, "test.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="released PyTorch .ckpt "
                                   "(torch.save {'epoch','model',...})")
    ap.add_argument("--data", help="eval tree (testpath)")
    ap.add_argument("--testlist")
    ap.add_argument("--synthetic", action="store_true",
                    help="build the in-container synthetic stand-in instead "
                         "of --ckpt/--data (proves the harness)")
    ap.add_argument("--dataset_name", default="bds8")
    ap.add_argument("--NviewGen", type=int, default=3)
    ap.add_argument("--NviewFilter", type=int, default=3)
    ap.add_argument("--numdepth", type=int, default=16)
    ap.add_argument("--interval_scale", type=float, default=1.0)
    ap.add_argument("--photomask", type=float, default=0.1)
    ap.add_argument("--geomask", type=int, default=1)
    ap.add_argument("--condmask_pixel", type=float, default=6.0)
    ap.add_argument("--condmask_depth", type=float, default=0.5)
    ap.add_argument("--target_mm", type=float, default=1.0,
                    help="PASS threshold on mean abs depth delta (BASELINE "
                         "north star: <1 mm vs released weights)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="parity_")
    if args.synthetic:
        ckpt, data, testlist = make_synthetic(workdir)
    else:
        if not (args.ckpt and args.data and args.testlist):
            ap.error("--ckpt/--data/--testlist required (or --synthetic)")
        ckpt, data, testlist = args.ckpt, args.data, args.testlist

    common = [
        "--dataset", "dataloader_eval", "--dataset_name", args.dataset_name,
        "--testpath", data, "--testlist", testlist,
        "--loadckpt", ckpt,
        "--NviewGen", str(args.NviewGen), "--NviewFilter", str(args.NviewFilter),
        "--numdepth", str(args.numdepth),
        "--interval_scale", str(args.interval_scale),
        "--photomask", str(args.photomask), "--geomask", str(args.geomask),
        "--condmask_pixel", str(args.condmask_pixel),
        "--condmask_depth", str(args.condmask_depth),
    ]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # both pipelines on CPU, f32:
    env["JAX_PLATFORMS"] = "cpu"           # bit-level comparability
    env["PYTHONPATH"] = REPO

    wrapper = os.path.join(workdir, "ref_wrapper.py")
    with open(wrapper, "w") as f:
        f.write(_REF_WRAPPER)
    out_ref = os.path.join(workdir, "out_ref")
    print("== running reference pipeline (CPU torch)")
    proc = subprocess.run(
        [sys.executable, wrapper] + common + ["--outdir", out_ref],
        capture_output=True, text=True, env=env, cwd=REFERENCE, timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-3000:], file=sys.stderr)
        raise SystemExit("reference eval.py failed")

    out_ours = os.path.join(workdir, "out_ours")
    print("== running our pipeline (CPU, f32)")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py")] + common
        + ["--outdir", out_ours, "--num_workers", "0"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-3000:], file=sys.stderr)
        raise SystemExit("our eval.py failed")

    # -- compare ------------------------------------------------------------
    import numpy as np

    from scene_3dreconstruction_mvsnet_tpu.io.images import read_mask
    from scene_3dreconstruction_mvsnet_tpu.io.pfm import read_pfm

    acq = os.path.basename(data.rstrip("/"))
    with open(testlist) as f:
        scans = [line.strip() for line in f if line.strip()]

    rows, worst_mean = [], 0.0
    for scan in scans:
        sref = os.path.join(out_ref, acq, scan)
        sour = os.path.join(out_ours, acq, scan)
        views = sorted(
            int(p.split(".")[0]) for p in os.listdir(os.path.join(sref, "depth_est"))
            if p.endswith(".pfm")
        )
        for v in views:
            d_ref = read_pfm(os.path.join(sref, f"depth_est/{v:0>8}.pfm"))[0]
            d_our = read_pfm(os.path.join(sour, f"depth_est/{v:0>8}.pfm"))[0]
            c_ref = read_pfm(os.path.join(sref, f"confidence/{v:0>8}.pfm"))[0]
            c_our = read_pfm(os.path.join(sour, f"confidence/{v:0>8}.pfm"))[0]
            dd = np.abs(d_ref - d_our)
            ious = {}
            for kind in ("photo", "geo", "final"):
                pr = os.path.join(sref, f"mask/{v:0>8}_{kind}.png")
                po = os.path.join(sour, f"mask/{v:0>8}_{kind}.png")
                if os.path.exists(pr) and os.path.exists(po):
                    m_ref, m_our = read_mask(pr), read_mask(po)
                    union = np.logical_or(m_ref, m_our).sum()
                    ious[kind] = (
                        float(np.logical_and(m_ref, m_our).sum() / union)
                        if union else 1.0
                    )
            row = {
                "scan": scan, "view": v,
                "depth_mean_abs_delta": float(dd.mean()),
                "depth_max_abs_delta": float(dd.max()),
                "conf_max_abs_delta": float(np.abs(c_ref - c_our).max()),
                **{f"iou_{k}": round(x, 4) for k, x in ious.items()},
            }
            worst_mean = max(worst_mean, row["depth_mean_abs_delta"])
            rows.append(row)
            print(json.dumps(row))

    verdict = "PASS" if worst_mean < args.target_mm else "FAIL"
    print(
        f"parity verdict: {verdict} — worst per-view mean abs depth delta "
        f"{worst_mean:.4f} (target < {args.target_mm} depth units; "
        f"{len(rows)} views, {len(scans)} scans)"
    )
    if not args.keep:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    raise SystemExit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
