"""Unified eval dataset for all rigs (DTU / BDS variants / real 'bin').

Behavioral parity with /root/reference/datasets/dataloader_eval.py:12-184:
 - parameterized by cam_subfolder / img_subfolder / img_res / dataset_name
   kwargs (the per-dataset registry lives in eval CLI, matching
   /root/reference/eval.py:851-895),
 - the bin rig's pair file lives two directories above datapath,
 - images go through rescale + center-crop-to-x32 with intrinsics
   adjustment (io.images.read_rescale_crop_img), then intrinsics /4 for the
   feature-net I/O factor,
 - DTU image filenames are 1-indexed, all others 0-indexed,
 - returns per-view intrinsics/extrinsics stacks for the filter stage.
"""

from __future__ import annotations

import os

import numpy as np

from .base import MVSDatasetBase
from ..io.images import read_rescale_crop_img


class MVSDataset(MVSDatasetBase):
    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.06, **kwargs):
        super().__init__(datapath, listfile, mode, nviews, ndepths,
                         interval_scale, **kwargs)
        self.cam_subfolder = kwargs.get("cam_subfolder", "Cameras")
        self.img_subfolder = kwargs.get("img_subfolder", "Rectified/{}/{:0>8}.png")
        self.img_res = tuple(kwargs.get("img_res", (512, 640)))
        self.dataset_name = kwargs.get("dataset_name", "dtu")
        # emit u8 images (exactly f32*255 — the /255 is the decode's last
        # step): eval stage A keeps pixels u8 end to end, quartering host
        # memcpy + transfer bytes. Default off for reference-contract
        # parity (torch loaders emit f32).
        self.emit_u8 = bool(kwargs.get("emit_u8", False))
        assert self.mode == "test"
        self.metas = self.build_list()

    def pair_path(self) -> str:
        if self.dataset_name == "bin":
            return os.path.join(self.datapath, "../..", self.pairfile)
        return os.path.join(self.datapath, self.pairfile)

    def build_list(self):
        metas = []
        scans = self.read_scan_list()
        for scan in scans:
            for ref_view, src_views in self.read_pairs(self.pair_path()):
                metas.append((scan, ref_view, src_views))
        print(
            f"[DataLoader] Mode:{self.mode}, #scenes:{len(scans)}, #metas:{len(metas)}"
        )
        return metas

    def __getitem__(self, idx):
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, proj_matrices = [], []
        intrinsics_list, extrinsics_list = [], []
        depth_values = None

        for i, vid in enumerate(view_ids):
            img_vid = vid + 1 if self.dataset_name == "dtu" else vid
            img_filename = os.path.join(
                self.datapath, self.img_subfolder.format(scan, img_vid)
            )
            cam_filename = os.path.join(
                self.datapath, self.cam_subfolder, f"{vid:0>8}_cam.txt"
            )

            intrinsics, extrinsics, depth_min, depth_interval = self.read_cam(cam_filename)
            if self.img_cache:
                from ..io.images import read_rescale_crop_img_cached

                np_img, intrinsics = read_rescale_crop_img_cached(
                    img_filename, intrinsics, self.img_res, self.img_cache,
                    return_u8=self.emit_u8,
                )
            else:
                np_img, intrinsics = read_rescale_crop_img(
                    img_filename, intrinsics, img_res=self.img_res,
                    return_u8=self.emit_u8,
                )
            imgs.append(np_img)

            intrinsics[:2, :] /= 4.0  # feature-net x4 I/O factor
            intrinsics_list.append(intrinsics)
            extrinsics_list.append(extrinsics)
            proj_matrices.append(self.compose_proj(intrinsics, extrinsics))

            if i == 0:
                depth_values = np.arange(
                    depth_min,
                    depth_interval * (self.ndepths - 0.5) + depth_min,
                    depth_interval,
                    dtype=np.float32,
                )

        return {
            "imgs": self.stack_views(
                imgs, dtype=np.uint8 if self.emit_u8 else np.float32
            ),
            "proj_matrices": np.stack(proj_matrices),
            "intrinsics": np.stack(intrinsics_list),
            "extrinsics": np.stack(extrinsics_list),
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
            # identity of each view slot — lets eval stage A keep a
            # device-resident per-(scan,view) image store (each image is
            # used ~nviews times per scan; uploading it once cuts the
            # host->device image traffic ~nviews x)
            "view_ids": np.asarray(view_ids, np.int32),
            "scan": scan,
        }
