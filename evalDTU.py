#!/usr/bin/env python
"""Legacy DTU-only evaluation CLI (component 32 of SURVEY.md §2).

Mirrors /root/reference/evalDTU.py: the older, DTU-hardwired variant of the
two-stage pipeline kept for output compatibility with historical runs. Key
differences vs eval.py (preserved deliberately):
  - stage A writes ONLY depth_est/confidence PFMs (no cams/images trees),
  - stage B reads camera files from the dataset's 'Cameras/' folder and
    divides intrinsics by 4 at read (evalDTU.py:354-357 in the reference),
  - colors come from the raw 1200x1600 image subsampled [0::4, 0::4] and
    cropped to the depth size,
  - back-projection uses the integer-corner pixel grid and NO empirical
    1.0531 x/y scale (reference evalDTU.py:425-427),
  - a PLY is always written.
The geometric consistency check itself runs on device (shared with eval.py).
"""

import argparse
import os
import sys
import time

import numpy as np

from scene_3dreconstruction_mvsnet_tpu.data import Loader, find_dataset_def
from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_reference_view
from scene_3dreconstruction_mvsnet_tpu.io.cams import (
    read_camera_parameters,
    read_pair_file,
)
from scene_3dreconstruction_mvsnet_tpu.io.images import read_img, save_mask
from scene_3dreconstruction_mvsnet_tpu.io.pfm import read_pfm, save_pfm
from scene_3dreconstruction_mvsnet_tpu.io.ply import write_ply
from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from scene_3dreconstruction_mvsnet_tpu.train.state import make_infer_step
from scene_3dreconstruction_mvsnet_tpu.utils import print_args

parser = argparse.ArgumentParser(description="Legacy DTU depth fusion (TPU-native)")
parser.add_argument("--model", default="mvsnet")
parser.add_argument("--dataset", default="dtu_yao_eval",
                    choices=["dtu_yao_eval", "blender_eval"])
parser.add_argument("--testpath", help="testing data path")
parser.add_argument("--testlist", help="testing scan list")
parser.add_argument("--pairfile", default="pair.txt")
parser.add_argument("--batch_size", type=int, default=1)
parser.add_argument("--numdepth", type=int, default=192)
parser.add_argument("--interval_scale", type=float, default=1.06)
parser.add_argument("--loadckpt", default=None)
parser.add_argument("--outdir", default="./outputs")
parser.add_argument("--NviewGen", type=int, default=5)
parser.add_argument("--NviewFilter", type=int, default=10)
parser.add_argument("--photomask", type=float, default=0.8)
parser.add_argument("--geomask", type=int, default=3)
parser.add_argument("--condmask_pixel", type=float, default=1.0)
parser.add_argument("--condmask_depth", type=float, default=0.01)
parser.add_argument("--num_workers", type=int, default=4)
parser.add_argument("--skip_gen", action="store_true")
parser.add_argument("--debug_MVSnet", type=int, default=0)
parser.add_argument("--debug_depth_gen", type=int, default=0)


def save_depth(args, model, variables):
    import jax.numpy as jnp

    MVSDataset = find_dataset_def(args.dataset)
    ds = MVSDataset(
        datapath=args.testpath, listfile=args.testlist, mode="test",
        nviews=args.NviewGen, ndepths=args.numdepth,
        interval_scale=args.interval_scale, pairfile=args.pairfile,
    )
    loader = Loader(ds, batch_size=1, num_workers=args.num_workers)
    infer = make_infer_step(model)
    acq = args.testpath.rstrip("/").split("/")[-1]

    for batch_idx, sample in enumerate(loader):
        outputs = infer(
            variables,
            jnp.asarray(sample["imgs"]),
            jnp.asarray(sample["proj_matrices"]),
            jnp.asarray(sample["depth_values"]),
        )
        depth = np.asarray(outputs["depth"])[0]
        conf = np.asarray(outputs["photometric_confidence"])[0]
        print(f"Iter {batch_idx}/{len(loader)}")
        filename = sample["filename"][0]
        depth_fn = os.path.join(args.outdir, acq, filename.format("depth_est", ".pfm"))
        conf_fn = os.path.join(args.outdir, acq, filename.format("confidence", ".pfm"))
        os.makedirs(os.path.dirname(depth_fn), exist_ok=True)
        os.makedirs(os.path.dirname(conf_fn), exist_ok=True)
        save_pfm(depth_fn, depth.astype(np.float32))
        save_pfm(conf_fn, conf.astype(np.float32))
        print(f"PFM saved: {depth_fn}")


def filter_depth(args, dataset_folder, scan, out_folder, plyfilename):
    print("===== FILTER DEPTHs =====")
    pair_data = read_pair_file(os.path.join(dataset_folder, "Cameras", args.pairfile))

    vertices, vertex_colors = [], []
    for ref_view, src_views in pair_data:
        t0 = time.time()
        src_views = src_views[: args.NviewFilter]

        def cam(view):
            K, E = read_camera_parameters(
                os.path.join(dataset_folder, f"Cameras/{view:0>8}_cam.txt")
            )
            K[:2, :] /= 4.0  # feature-net I/O factor, applied at filter time
            return K, E

        ref_K, ref_E = cam(ref_view)
        ref_depth = read_pfm(os.path.join(out_folder, f"depth_est/{ref_view:0>8}.pfm"))[0]
        confidence = read_pfm(os.path.join(out_folder, f"confidence/{ref_view:0>8}.pfm"))[0]
        ref_img = read_img(
            os.path.join(
                dataset_folder, f"Rectified_raw/{scan}/rect_{ref_view + 1:0>3}_3_r5000.png"
            )
        )
        h_d, w_d = ref_depth.shape
        ref_img_cropped = ref_img[0::4, 0::4, :][:h_d, :w_d, :]

        src_depths, src_Ks, src_Es = [], [], []
        for src_view in src_views:
            K, E = cam(src_view)
            src_Ks.append(K)
            src_Es.append(E)
            src_depths.append(
                read_pfm(os.path.join(out_folder, f"depth_est/{src_view:0>8}.pfm"))[0]
            )

        result = fuse_reference_view(
            ref_depth, confidence, ref_K, ref_E,
            np.stack(src_depths), np.stack(src_Ks), np.stack(src_Es),
            photomask=args.photomask, geomask=args.geomask,
            condmask_pixel=args.condmask_pixel, condmask_depth=args.condmask_depth,
        )
        photo_mask, geo_mask, final_mask = (
            result["photo_mask"], result["geo_mask"], result["final_mask"],
        )
        os.makedirs(os.path.join(out_folder, "mask"), exist_ok=True)
        save_mask(os.path.join(out_folder, f"mask/{ref_view:0>8}_photo.png"), photo_mask)
        save_mask(os.path.join(out_folder, f"mask/{ref_view:0>8}_geo.png"), geo_mask)
        save_mask(os.path.join(out_folder, f"mask/{ref_view:0>8}_final.png"), final_mask)
        print(
            "SUMMARY: Ref_view: {:0>2}, photo/geo/final-mask:"
            "{:.2f}%/{:.2f}%/{:.2f}% time={:.2f}s".format(
                ref_view, photo_mask.mean() * 100, geo_mask.mean() * 100,
                final_mask.mean() * 100, time.time() - t0,
            )
        )

        # legacy back-projection: integer grid, masked points, no 1.0531
        depth_avg = result["depth_est_averaged"]
        x, y = np.meshgrid(np.arange(w_d), np.arange(h_d))
        valid = final_mask
        xv, yv, dv = x[valid], y[valid], depth_avg[valid]
        xyz_ref = np.linalg.inv(ref_K) @ (np.vstack([xv, yv, np.ones_like(xv)]) * dv)
        xyz_world = (np.linalg.inv(ref_E) @ np.vstack([xyz_ref, np.ones_like(xv)]))[:3]
        vertices.append(xyz_world.T)
        vertex_colors.append((ref_img_cropped[valid] * 255).astype(np.uint8))

    vertices_all = np.concatenate(vertices, axis=0)
    colors_all = np.concatenate(vertex_colors, axis=0)
    write_ply(plyfilename, vertices_all.astype(np.float32), colors_all)
    print("saving the final model to", plyfilename)


def main():
    args = parser.parse_args()
    print("argv:", sys.argv[1:])
    print_args(args)

    # auto depth chunking bounds the sweep's warp-footprint buffers at the
    # legacy DTU eval res (1200x1600 cropped to 1184x1600; f32 full-D is
    # ~2.9 GB per buffer) — exact, and a no-op at small/test shapes
    from scene_3dreconstruction_mvsnet_tpu.eval.depth_gen import auto_depth_chunk

    model = MVSNet(
        refine=False, depth_chunk=auto_depth_chunk((1200, 1600), args.numdepth)
    )
    if not args.skip_gen:
        if args.loadckpt is None:
            raise SystemExit("--loadckpt is required")
        if os.path.isdir(args.loadckpt):
            from scene_3dreconstruction_mvsnet_tpu.train import restore_variables

            variables = restore_variables(args.loadckpt)
        else:
            from scene_3dreconstruction_mvsnet_tpu.interop import load_torch_checkpoint

            variables = load_torch_checkpoint(args.loadckpt)
        save_depth(args, model, variables)

    with open(args.testlist) as f:
        scans = [line.rstrip() for line in f.readlines() if line.strip()]

    acq = args.testpath.rstrip("/").split("/")[-1]
    for scan in scans:
        import re

        scan_id = int(re.findall(r"\d+", scan)[0])
        out_folder = os.path.join(args.outdir, acq, scan)
        plyfilename = os.path.join(args.outdir, acq, f"mvsnet{scan_id:0>3}_l3.ply")
        filter_depth(args, args.testpath, scan, out_folder, plyfilename)


if __name__ == "__main__":
    main()
