"""Profile the host input pipeline at the DTU-full eval resolution.

VERDICT round-1 item 10: measure the stage-A wall-clock split (PIL decode +
preprocess vs device forward) on this 1-core host and decide whether a
pre-decoded cache is needed. The reference hides decode behind
DataLoader(num_workers=10) (/root/reference/train.py:117); our Loader
overlaps it with a thread pool + BackgroundLoader, but with ONE core the
decode is serial with compute no matter how many threads — so what matters
is decode seconds per sample vs device seconds per depthmap.

Usage: python scripts/profile_input.py [--res H W] [--views N]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    res = (864, 1152)
    if "--res" in sys.argv:
        i = sys.argv.index("--res")
        res = (int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    n_views = int(sys.argv[sys.argv.index("--views") + 1]) if "--views" in sys.argv else 5

    from PIL import Image

    from scene_3dreconstruction_mvsnet_tpu.data import find_dataset_def
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        SyntheticRig, make_eval_tree, write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.io.images import read_rescale_crop_img

    tmp = tempfile.mkdtemp(prefix="profile_input_")
    rig = SyntheticRig(n_views=max(6, n_views + 1), img_hw=res, focal=0.9 * res[1])
    t0 = time.time()
    make_eval_tree(tmp, scan="scan1", rig=rig, ndepths=192)
    print(f"fixture tree ({rig.n_views} views @ {res[0]}x{res[1]}): "
          f"{time.time()-t0:.1f}s", file=sys.stderr)
    write_scan_list(os.path.join(tmp, "eval.txt"), ["scan1"])

    MVSDataset = find_dataset_def("dataloader_eval")
    ds = MVSDataset(
        tmp, os.path.join(tmp, "eval.txt"), "test", n_views, 192,
        cam_subfolder="Cameras",
        img_subfolder="Rectified/{}/rect_C{:0>3}_L00.png",
        img_res=res, dataset_name="profile",
    )

    # full __getitem__
    _ = ds[0]  # warm the page cache
    t0 = time.time()
    iters = 5
    for i in range(iters):
        sample = ds[i % len(ds)]
    per_sample = (time.time() - t0) / iters

    # component split on one image
    img_path = os.path.join(tmp, "Rectified", "scan1", "rect_C000_L00.png")
    K = rig.K.copy()

    t0 = time.time()
    for _ in range(iters):
        im = Image.open(img_path)
        arr = np.asarray(im)
    decode = (time.time() - t0) / iters

    t0 = time.time()
    for _ in range(iters):
        read_rescale_crop_img(img_path, K.copy(), img_res=res)
    decode_plus_prep = (time.time() - t0) / iters

    print(f"per-sample __getitem__ ({n_views} views):    {per_sample*1e3:8.1f} ms")
    print(f"  PIL open+decode, per view:              {decode*1e3:8.1f} ms")
    print(f"  decode + rescale/crop/f32, per view:    {decode_plus_prep*1e3:8.1f} ms")
    print(f"  non-image overhead (cams, stacking):    "
          f"{(per_sample - n_views*decode_plus_prep)*1e3:8.1f} ms")
    print(f"device forward at this res (bench.py):       ~254.0 ms")
    ratio = per_sample / 0.254
    print(f"host decode / device compute ratio:        {ratio:8.2f}x")

    # npy-cache variant: pre-decoded float32 arrays, mmap-read
    cache = os.path.join(tmp, "cache.npy")
    arr, _ = read_rescale_crop_img(img_path, K.copy(), img_res=res)
    np.save(cache, arr)
    t0 = time.time()
    for _ in range(iters):
        a = np.load(cache, mmap_mode=None)
    npy_read = (time.time() - t0) / iters
    print(f"  np.load of pre-decoded f32, per view:   {npy_read*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
