"""Eval stage A: per-reference-view depth map generation.

TPU equivalent of save_depth (/root/reference/eval.py:283-500): run MVSNet
for each reference view of the eval dataset and write the output tree

    <outdir>/<acquisition>/<scan>/images/XXXXXXXX.png
                                 /depth_est/XXXXXXXX.pfm (+ .png preview)
                                 /confidence/XXXXXXXX.pfm (+ .png preview)
                                 /cams/XXXXXXXX_cam.txt

The forward pass is one jitted launch per shape; the writer runs on host
threads so the device never waits on PNG/PFM encoding.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp
import numpy as np

from ..data import Loader, find_dataset_def
from ..io.cams import write_cam
from ..io.images import save_image_u8
from ..io.pfm import save_pfm
from ..train.state import make_infer_step


def _normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = np.min(x), np.max(x)
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def _write_view(outdir_acq, filename_tpl, ref_img, depth, confidence, K, E):
    img_path = os.path.join(outdir_acq, filename_tpl.format("images", ".png"))
    depth_path = os.path.join(outdir_acq, filename_tpl.format("depth_est", ".pfm"))
    conf_path = os.path.join(outdir_acq, filename_tpl.format("confidence", ".pfm"))
    cam_path = os.path.join(outdir_acq, filename_tpl.format("cams", "_cam.txt"))
    for p in (img_path, depth_path, conf_path, cam_path):
        os.makedirs(os.path.dirname(p), exist_ok=True)

    save_image_u8(img_path, ref_img)
    save_pfm(depth_path, depth.astype(np.float32))
    save_image_u8(depth_path.replace(".pfm", ".png"), _normalize01(depth))
    save_pfm(conf_path, confidence.astype(np.float32))
    save_image_u8(conf_path.replace(".pfm", ".png"), np.clip(confidence, 0, 1))
    write_cam(cam_path, K=K, R=E, depth_params=["000", "2.5", "", ""])


def save_depth(
    model,
    variables,
    *,
    dataset: str,
    dataset_name: str,
    testpath: str,
    testlist: str,
    outdir: str,
    NviewGen: int = 5,
    numdepth: int = 192,
    interval_scale: float = 1.06,
    pairfile: str = "pair.txt",
    cam_subfolder: str = "Cameras",
    img_subfolder: str = "Rectified/{}/{:0>8}.png",
    img_res: tuple[int, int] = (512, 640),
    num_workers: int = 4,
    debug_bitmask: int = 0,
) -> dict:
    """Run depth generation for every reference view. Returns timing stats."""
    print(f"============ Generating DEPTH MAPS using {NviewGen} views")
    MVSDataset = find_dataset_def(dataset)
    test_dataset = MVSDataset(
        datapath=testpath,
        listfile=testlist,
        mode="test",
        nviews=NviewGen,
        ndepths=numdepth,
        interval_scale=interval_scale,
        pairfile=pairfile,
        cam_subfolder=cam_subfolder,
        img_subfolder=img_subfolder,
        img_res=img_res,
        dataset_name=dataset_name,
    )
    loader = Loader(test_dataset, batch_size=1, num_workers=num_workers)
    infer = make_infer_step(model)

    acquisition_folder = testpath.rstrip("/").split("/")[-1]
    outdir_acq = os.path.join(outdir, acquisition_folder)

    gen_times: list[float] = []
    writer = ThreadPoolExecutor(max_workers=2)
    pending = []
    for batch_idx, sample in enumerate(loader):
        if batch_idx == 0 and debug_bitmask:
            from ..utils.debug_dump import debug_forward

            debug_forward(
                model, variables, sample["imgs"], sample["proj_matrices"],
                sample["depth_values"], debug_bitmask, outdir_acq,
            )
        t0 = time.time()
        outputs = infer(
            variables,
            jnp.asarray(sample["imgs"]),
            jnp.asarray(sample["proj_matrices"]),
            jnp.asarray(sample["depth_values"]),
        )
        depth = np.asarray(outputs["depth"])[0]
        confidence = np.asarray(outputs["photometric_confidence"])[0]
        gen_times.append(time.time() - t0)
        print(
            f"Iter {batch_idx + 1}/{len(loader)} "
            f"(fwd pass in {gen_times[-1]:.3f}s)"
        )

        filename_tpl = sample["filename"][0]
        ref_img = sample["imgs"][0, 0]
        K = sample["intrinsics"][0][0] if "intrinsics" in sample else None
        E = sample["extrinsics"][0][0] if "extrinsics" in sample else None
        if K is None:
            raise ValueError(
                "eval dataset must return intrinsics/extrinsics "
                "(use dataset='dataloader_eval')"
            )
        pending.append(
            writer.submit(
                _write_view, outdir_acq, filename_tpl, ref_img, depth, confidence, K, E
            )
        )
    for f in pending:
        f.result()
    writer.shutdown()

    avg = float(np.mean(gen_times)) if gen_times else 0.0
    steady = float(np.mean(gen_times[1:])) if len(gen_times) > 1 else avg
    print(f"Averaged generation time: {avg}")
    return {
        "avg_gen_time": avg,
        "steady_gen_time": steady,
        "n_views": len(gen_times),
        "outdir_acq": outdir_acq,
    }
