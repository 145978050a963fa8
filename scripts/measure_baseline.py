#!/usr/bin/env python
"""Measure the PyTorch reference's CPU forward throughput (the BASELINE.md
ledger). The reference publishes no numbers; the driver's north-star metric
is depthmaps/sec/chip vs the reference measured on CPU (BASELINE.md).

Imports the reference model from /root/reference (read-only) and times its
eval forward on random weights/inputs. Writes baseline_cpu.json next to
BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from models.mvsnet import MVSNet  # noqa: E402  (reference import, CPU torch)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    # name: (V, H_img, W_img, D)
    "dtu_small_3v_96d_512x640": (3, 512, 640, 96),
    "headline_5v_192d_864x1152": (5, 864, 1152, 192),
}


def make_inputs(V, H, W, D):
    rng = np.random.RandomState(0)
    imgs = torch.from_numpy(rng.rand(1, V, 3, H, W).astype(np.float32))
    projs = []
    K = np.array([[W * 0.7, 0, W / 8], [0, W * 0.7, H / 8], [0, 0, 1]], np.float32)
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = -2.0 * v
        P = E.copy()
        P[:3, :4] = (K / 4.0) @ E[:3, :4]
        projs.append(P)
    proj = torch.from_numpy(np.stack(projs)[None])
    dv = torch.from_numpy(np.linspace(425, 905, D, dtype=np.float32)[None])
    return imgs, proj, dv


def main():
    torch.set_num_threads(os.cpu_count() or 1)
    model = MVSNet(refine=False, debug=0)
    model.eval()

    results = {}
    for name, (V, H, W, D) in CONFIGS.items():
        imgs, proj, dv = make_inputs(V, H, W, D)
        with torch.no_grad():
            t0 = time.time()
            model(imgs, proj, dv)
            warm = time.time() - t0
            n_timed = 2 if warm < 60 else 1
            times = []
            for _ in range(n_timed):
                t0 = time.time()
                model(imgs, proj, dv)
                times.append(time.time() - t0)
        sec = float(np.mean(times))
        results[name] = {
            "seconds_per_depthmap": sec,
            "depthmaps_per_sec": 1.0 / sec,
            "config": {"views": V, "img_h": H, "img_w": W, "ndepths": D},
            "hardware": "container CPU (1 core), torch " + torch.__version__,
        }
        print(f"{name}: {sec:.3f}s/depthmap ({1.0/sec:.4f} dm/s)")

    out = os.path.join(REPO, "baseline_cpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
