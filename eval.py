#!/usr/bin/env python
"""Depth generation + filtering + fusion CLI (TPU-native).

Mirrors the reference eval surface (/root/reference/eval.py:26-74): the same
--NviewGen/--NviewFilter/--photomask/--geomask/--condmask_pixel/
--condmask_depth knobs, dataset-name registries (cam/img subfolders and
resolutions per dataset, /root/reference/eval.py:851-895), two-stage
pipeline communicating through the same on-disk file layout. Stage B's
geometric consistency runs on device (the reference does it on CPU).
"""

import argparse
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

from scene_3dreconstruction_mvsnet_tpu.eval import filter_depth, save_depth
from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from scene_3dreconstruction_mvsnet_tpu.utils import print_args

parser = argparse.ArgumentParser(
    description="Predict depth, filter, and fuse (TPU-native MVSNet)"
)
parser.add_argument("--model", default="mvsnet")
parser.add_argument("--dataset", default="dataloader_eval",
                    choices=["dtu_yao_eval", "blender_eval", "dataloader_eval"])
parser.add_argument("--dataset_name", default="dtu",
                    choices=["dtu", "bds1", "bds2", "bds4", "bds6", "bds7", "bds8", "bin"])
parser.add_argument("--testpath", help="testing data path")
parser.add_argument("--testlist", help="testing scan list")
parser.add_argument("--pairfile", default="pair.txt")

parser.add_argument("--batch_size", type=int, default=1)
parser.add_argument("--numdepth", type=int, default=192)
parser.add_argument("--interval_scale", type=float, default=1.06)

parser.add_argument("--loadckpt", default=None,
                    help="checkpoint: orbax ckpt dir or a PyTorch .ckpt file")
parser.add_argument("--outdir", default="./outputs")
parser.add_argument("--save_ply", action="store_true")
parser.add_argument("--postprocess", action="store_true",
                    help="crop to bin bbox + statistical outlier removal + "
                         "voxel downsample of the fused cloud")

parser.add_argument("--NviewGen", type=int, default=5,
                    help="number of views used to generate depth maps (DTU=5)")
parser.add_argument("--NviewFilter", type=int, default=10,
                    help="number of src views used while filtering (DTU=10)")
parser.add_argument("--photomask", type=float, default=0.8,
                    help="photometric confidence threshold")
parser.add_argument("--geomask", type=int, default=3,
                    help="min number of consistent views")
parser.add_argument("--condmask_pixel", type=float, default=1.0,
                    help="max reprojection distance in pixels")
parser.add_argument("--condmask_depth", type=float, default=0.01,
                    help="max relative depth difference")

parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
parser.add_argument("--depth_chunk", type=int, default=None)
parser.add_argument("--use_pallas", action="store_true",
                    help="fused Pallas regression kernel (TPU only)")
parser.add_argument("--pallas_sweep", action="store_true",
                    help="fused Pallas plane-sweep variance kernel for stage "
                         "A (requires --dtype bfloat16); envelope planned "
                         "from eval samples, with an in-graph XLA fallback")
parser.add_argument("--flat_features", action="store_true",
                    help="FeatureNet in the flat block-Toeplitz layout "
                         "(ops/flat_conv.py, ~2x on TPU; same param tree)")
parser.add_argument("--flat_costreg", action="store_true",
                    help="CostRegNet in the flat block-Toeplitz layout")
parser.add_argument("--pallas_conv0", action="store_true",
                    help="fused Pallas streaming kernel for CostRegNet conv0 "
                         "(requires --flat_costreg and --dtype bfloat16; "
                         "ops/pallas/conv0_fused.py)")
parser.add_argument("--img_cache", default=None,
                    help="directory for a pre-decoded image cache (first "
                         "epoch populates it; later reads are mmap loads)")
parser.add_argument("--aot_cache", default=None,
                    help="directory for the compiled-executable cache "
                         "(utils/aot_cache.py): later processes with the "
                         "same model config + batch geometry skip the ~20 s "
                         "XLA compile. Defaults to <img_cache>/aot when "
                         "--img_cache is set; pass 'off' to disable")
parser.add_argument("--num_workers", type=int, default=4)
parser.add_argument("--data_shards", type=int, default=1,
                    help="shard eval stage A's view/batch axis over this "
                         "many devices ('data' mesh axis; batch_size must "
                         "be a multiple). The multi-chip answer to the "
                         "reference's eval-time DataParallel "
                         "(/root/reference/eval.py:309)")
parser.add_argument("--no_device_store", action="store_true",
                    help="disable the per-(scan,view) device-resident image "
                         "store (each image is otherwise uploaded once and "
                         "reused across the ~NviewGen batches that view it)")
parser.add_argument("--no_overlap_filter", action="store_true",
                    help="run stage B strictly after stage A instead of "
                         "filtering each scan as its depth maps finish")
parser.add_argument("--serve", action="store_true",
                    help="serving loop: read scan names from stdin (one per "
                         "line; EOF or 'quit' ends) and run stage A + B per "
                         "request in this one long-lived process. Warm state "
                         "— the jitted/AOT infer step, device image store, "
                         "sweep envelope, D2H channel — is reused across "
                         "scans, amortizing the per-process costs the batch "
                         "CLI pays once per invocation (--testlist is "
                         "ignored; scans resolve under --testpath)")
parser.add_argument("--skip_gen", action="store_true",
                    help="skip stage A (reuse existing depth maps)")
parser.add_argument("--skip_filter", action="store_true", help="skip stage B")
parser.add_argument("--xy_scale", type=float, default=1.0531,
                    help="empirical world-x/y scale applied during fusion "
                         "(reference eval.py:264)")

parser.add_argument("--debug_MVSnet", type=int, default=0,
                    help="bitmask: dump forward stages as PNGs (headless "
                         "equivalent of the reference's cv2 windows)")
parser.add_argument("--debug_depth_gen", type=int, default=0,
                    help="bitmask (/root/reference/eval.py:61-67): 0 input "
                         "image, 1 depth/confidence PNGs, 2 per-view cloud "
                         "PLY, 3 combined cloud PLY — headless dumps")
parser.add_argument("--debug_depth_filter", type=int, default=0,
                    help="bitmask (/root/reference/eval.py:69-74): 0 depth+"
                         "mask PNGs, 1 per-view cloud PLY, 2 fused cloud "
                         "PLY — headless dumps")

# registry overrides (the reference hardcodes these per dataset name)
parser.add_argument("--img_res", type=int, nargs=2, default=None,
                    metavar=("H", "W"), help="override registry image resolution")
parser.add_argument("--cam_subfolder", default=None,
                    help="override registry camera subfolder")
parser.add_argument("--img_subfolder", default=None,
                    help="override registry image filename template")

# per-dataset registries (parity with /root/reference/eval.py:851-895)
DICT_CAM_SUBFOLDER = {
    "dtu": "Cameras",
    "bds1": "Cameras_1200x1600",
    "bds2": "Cameras_512x640",
    "bds4": "Cameras_512x640",
    "bds6": "Cameras_512x640",
    "bds7": "Cameras_512x640",
    "bds8": "Cameras_512x640",
    "bin": "Cameras",
}
DICT_IMG_SUBFOLDER = {
    "dtu": "Rectified_raw/{}/rect_{:0>3}_3_r5000.png",
    "bds1": "Rectified_1200x1600/{}/rect_C{:0>3}_L00.png",
    "bds2": "Rectified_512x640/{}/rect_C{:0>3}_L00.png",
    "bds4": "Rectified_1024x1280/{}/rect_C{:0>3}_L00.png",
    "bds6": "Rectified_512x640/{}/rect_C{:0>3}_L00.png",
    "bds7": "Rectified_512x640/{}/rect_C{:0>3}_L00.png",
    "bds8": "Rectified_512x640/{}/rect_C{:0>3}_L00.png",
    "bin": "Rectified/{}/00000{:0>3}.png",
}
DICT_IMG_RES = {
    "dtu": (600, 800),
    "bds1": (1200, 1600),
    "bds2": (512, 640),
    "bds4": (1024, 1280),
    "bds6": (1024, 1280),
    "bds7": (512, 640),
    "bds8": (512, 640),
    "bin": (512, 640),
}


def load_variables(args, model):
    """Load eval variables from an orbax dir or a torch .ckpt file."""
    if args.loadckpt is None:
        raise SystemExit("--loadckpt is required")
    if os.path.isdir(args.loadckpt):
        from scene_3dreconstruction_mvsnet_tpu.train import restore_variables

        # restore_variables rebuilds the pytree from checkpoint metadata —
        # no model.init here (a full MVSNet jit-compile just to shape the
        # restore template cost ~45 s of eval startup through the tunnel)
        return restore_variables(args.loadckpt)
    from scene_3dreconstruction_mvsnet_tpu.interop import load_torch_checkpoint

    return load_torch_checkpoint(args.loadckpt)


def serve_loop(args, model, run_filter, cam_subfolder, img_subfolder,
               img_res, outdir_acq) -> None:
    """One long-lived serving process: scan requests in, depth/mask/PLY out.

    Generalizes the reference's batch CLI (/root/reference/eval.py:848-929)
    to a request stream: each stdin line names a scan under --testpath; the
    warm model, jitted/AOT executables, device image store, and planned
    sweep envelope carry across requests (save_depth's ``session``), so the
    per-process costs — D2H channel setup (30-300 s on this tunnel), ~20 s
    XLA compile, envelope planning — are paid once for the whole stream.
    The production shape for a fixed camera rig imaging a stream of bins.
    """
    import tempfile

    variables = load_variables(args, model)
    session: dict = {}
    served = 0
    views_total = 0.0
    t_first_done = None  # sustained throughput excludes the warmup request
    views_after_first = 0
    print("SERVE ready: one scan name per line on stdin ('quit' ends)",
          flush=True)
    t_loop0 = time.time()
    for line in sys.stdin:
        scan = line.strip()
        if not scan or scan == "quit":
            break
        t0 = time.time()
        fd, tmplist = tempfile.mkstemp(suffix=".txt", text=True)
        with os.fdopen(fd, "w") as f:
            f.write(scan + "\n")
        try:
            stats = save_depth(
                model,
                variables,
                dataset=args.dataset,
                dataset_name=args.dataset_name,
                testpath=args.testpath,
                testlist=tmplist,
                outdir=args.outdir,
                NviewGen=args.NviewGen,
                numdepth=args.numdepth,
                interval_scale=args.interval_scale,
                pairfile=args.pairfile,
                cam_subfolder=cam_subfolder,
                img_subfolder=img_subfolder,
                img_res=img_res,
                num_workers=args.num_workers,
                debug_bitmask=args.debug_MVSnet,
                debug_depth_gen=args.debug_depth_gen,
                batch_size=args.batch_size,
                img_cache=args.img_cache,
                pallas_sweep=args.pallas_sweep,
                device_img_store=not args.no_device_store,
                aot_cache=args.aot_cache,
                data_shards=args.data_shards,
                session=session,
            )
        finally:
            os.unlink(tmplist)
        if not args.skip_filter:
            run_filter(scan)
        dt = time.time() - t0
        served += 1
        views_total += stats["n_views"]
        if t_first_done is None:
            t_first_done = time.time()
        else:
            views_after_first += stats["n_views"]
        print(f"SERVED {scan}: {stats['n_views']} views in {dt:.2f}s "
              f"({stats['n_views'] / dt:.3f} views/s this request)",
              flush=True)
    total = time.time() - t_loop0
    line = {
        "scans": served,
        "views": int(views_total),
        "wall_s": round(total, 2),
        "views_per_s": round(views_total / total, 3) if total > 0 else None,
    }
    if t_first_done is not None and served > 1:
        steady = time.time() - t_first_done
        line["views_per_s_sustained"] = round(views_after_first / steady, 3)
    import json

    print("SERVE summary: " + json.dumps(line), flush=True)


def main() -> None:
    args = parser.parse_args()
    print("argv:", sys.argv[1:])
    print_args(args)

    import jax.numpy as jnp

    if args.pallas_sweep and args.dtype != "bfloat16":
        parser.error("--pallas_sweep requires --dtype bfloat16")
    if args.pallas_conv0 and not (args.flat_costreg and args.dtype == "bfloat16"):
        parser.error("--pallas_conv0 requires --flat_costreg and --dtype bfloat16")
    model = MVSNet(
        refine=False,
        depth_chunk=args.depth_chunk,
        use_pallas_regression=args.use_pallas,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        flat_features=args.flat_features,
        flat_costreg=args.flat_costreg,
        pallas_conv0=args.pallas_conv0,
    )

    if args.aot_cache == "off":
        args.aot_cache = None
    elif args.aot_cache is None and args.img_cache:
        args.aot_cache = os.path.join(args.img_cache, "aot")

    cam_subfolder = args.cam_subfolder or DICT_CAM_SUBFOLDER[args.dataset_name]
    img_subfolder = args.img_subfolder or DICT_IMG_SUBFOLDER[args.dataset_name]
    img_res = tuple(args.img_res) if args.img_res else DICT_IMG_RES[args.dataset_name]

    acquisition_folder = args.testpath.rstrip("/").split("/")[-1]
    outdir_acq = os.path.join(args.outdir, acquisition_folder)

    def run_filter(scan: str) -> None:
        scan_id_match = re.findall(r"\d+", scan)
        scan_id = int(scan_id_match[0]) if scan_id_match else 0
        out_folder = os.path.join(outdir_acq, scan)
        plyfilename = os.path.join(outdir_acq, f"mvsnet{scan_id:0>3}_l3.ply")
        filter_depth(
            args.testpath,
            scan,
            out_folder,
            plyfilename,
            outdir_acq=outdir_acq,
            pairfile=args.pairfile,
            dataset_name=args.dataset_name,
            NviewFilter=args.NviewFilter,
            photomask=args.photomask,
            geomask=args.geomask,
            condmask_pixel=args.condmask_pixel,
            condmask_depth=args.condmask_depth,
            save_ply=args.save_ply,
            xy_scale=args.xy_scale,
            postprocess=args.postprocess,
            debug_depth_filter=args.debug_depth_filter,
            aot_cache=args.aot_cache,
        )

    if args.serve:
        serve_loop(args, model, run_filter, cam_subfolder, img_subfolder,
                   img_res, outdir_acq)
        return

    # Overlap stage B with stage A across scans: the device idles through
    # most of host-bound stage A, so each finished scan's filter/fusion
    # (one fuse_scan launch + host writes) runs on a worker thread while
    # later scans still generate depth. Single worker keeps scan order.
    overlap = (
        not args.skip_gen and not args.skip_filter and not args.no_overlap_filter
    )
    filter_pool = ThreadPoolExecutor(max_workers=1) if overlap else None
    filter_futures: dict = {}

    def on_scan_done(scan: str) -> None:
        filter_futures[scan] = filter_pool.submit(run_filter, scan)

    t_start = time.time()
    if not args.skip_gen:
        variables = load_variables(args, model)
        print(f"ckpt load: {time.time() - t_start:.2f}s")
        save_depth(
            model,
            variables,
            dataset=args.dataset,
            dataset_name=args.dataset_name,
            testpath=args.testpath,
            testlist=args.testlist,
            outdir=args.outdir,
            NviewGen=args.NviewGen,
            numdepth=args.numdepth,
            interval_scale=args.interval_scale,
            pairfile=args.pairfile,
            cam_subfolder=cam_subfolder,
            img_subfolder=img_subfolder,
            img_res=img_res,
            num_workers=args.num_workers,
            debug_bitmask=args.debug_MVSnet,
            debug_depth_gen=args.debug_depth_gen,
            batch_size=args.batch_size,
            img_cache=args.img_cache,
            pallas_sweep=args.pallas_sweep,
            device_img_store=not args.no_device_store,
            on_scan_done=on_scan_done if overlap else None,
            aot_cache=args.aot_cache,
            data_shards=args.data_shards,
        )

    t_stage_a = time.time() - t_start
    if not args.skip_gen:
        print(f"stage A wall: {t_stage_a:.3f}s (files in -> depth/conf PFMs out)")
    if args.skip_filter:
        return

    t_b0 = time.time()
    with open(args.testlist) as f:
        scans = [line.rstrip() for line in f.readlines() if line.strip()]

    for scan in scans:
        if scan in filter_futures:
            filter_futures[scan].result()  # overlapped with stage A
        else:
            run_filter(scan)
    if filter_pool is not None:
        filter_pool.shutdown()
    print(f"stage B wall: {time.time() - t_b0:.3f}s "
          f"(PFMs in -> masks{' + PLY' if args.save_ply else ''} out)")
    print(f"total wall: {time.time() - t_start:.3f}s")


if __name__ == "__main__":
    main()
