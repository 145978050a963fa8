"""DTU train/val/test dataset (Yao-Yao preprocessing layout).

Behavioral parity with /root/reference/datasets/dtu_yao.py:8-120:
 - metas = scan list x 49 pair-file viewpoints x 7 light conditions,
 - images 'Rectified/{scan}_train/rect_{vid+1:03d}_{light}_r5000.png'
   (512x640), depth/mask at 128x160 under 'Depths/{scan}_train/',
 - cam files 'Cameras/train/{vid:08d}_cam.txt' already carry feature-scale
   intrinsics (no /4 here),
 - depth_values = arange(depth_min, depth_interval*ndepths + depth_min,
   depth_interval) — the reference's endpoint convention, kept verbatim.
"""

from __future__ import annotations

import os

import numpy as np

from .base import MVSDatasetBase


class MVSDataset(MVSDatasetBase):
    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.06, **kwargs):
        super().__init__(datapath, listfile, mode, nviews, ndepths,
                         interval_scale, **kwargs)
        assert self.mode in ["train", "val", "test"]
        self.metas = self.build_list()

    def build_list(self):
        metas = []
        pair_path = os.path.join(self.datapath, "Cameras", self.pairfile)
        scans = self.read_scan_list()
        for scan in scans:
            for ref_view, src_views in self.read_pairs(pair_path):
                for light_idx in range(7):
                    metas.append((scan, light_idx, ref_view, src_views))
        print(f"dataset {self.mode} metas: {len(metas)}")
        return metas

    def __getitem__(self, idx):
        scan, light_idx, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, proj_matrices = [], []
        depth = mask = depth_values = None

        for i, vid in enumerate(view_ids):
            # image files are 1-indexed, depth/mask/cam files 0-indexed
            img_filename = os.path.join(
                self.datapath,
                f"Rectified/{scan}_train/rect_{vid + 1:0>3}_{light_idx}_r5000.png",
            )
            mask_filename = os.path.join(
                self.datapath, f"Depths/{scan}_train/depth_visual_{vid:0>4}.png"
            )
            depth_filename = os.path.join(
                self.datapath, f"Depths/{scan}_train/depth_map_{vid:0>4}.pfm"
            )
            cam_filename = os.path.join(
                self.datapath, f"Cameras/train/{vid:0>8}_cam.txt"
            )

            imgs.append(self.read_img(img_filename))
            intrinsics, extrinsics, depth_min, depth_interval = self.read_cam(cam_filename)
            proj_matrices.append(self.compose_proj(intrinsics, extrinsics))

            if i == 0:
                depth_values = np.arange(
                    depth_min,
                    depth_interval * self.ndepths + depth_min,
                    depth_interval,
                    dtype=np.float32,
                )
                mask = self.read_img(mask_filename)
                depth = self.read_depth(depth_filename)

        return {
            "imgs": self.stack_views(imgs),
            "proj_matrices": np.stack(proj_matrices),
            "depth": depth,
            "depth_values": depth_values,
            "mask": mask,
        }
