"""Legacy DTU eval dataset.

Behavioral parity with /root/reference/datasets/dtu_yao_eval.py:9-110:
1200x1600 images cropped to 1184x1600 (bottom rows removed; principal point
unchanged), intrinsics divided by 4 at cam read, shared cam files per scan,
depth_values endpoint (ndepths - 0.5), returns a filename template.
"""

from __future__ import annotations

import os

import numpy as np

from .base import MVSDatasetBase


class MVSDataset(MVSDatasetBase):
    PAIR_SUBFOLDER = "Cameras"
    IMG_PATTERN = "Rectified_raw/{scan}/rect_{vid1:0>3}_3_r5000.png"
    CAM_PATTERN = "Cameras/{vid:0>8}_cam.txt"

    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.06, **kwargs):
        super().__init__(datapath, listfile, mode, nviews, ndepths,
                         interval_scale, **kwargs)
        assert self.mode == "test"
        self.metas = self.build_list()

    def build_list(self):
        metas = []
        pair_path = os.path.join(self.datapath, self.PAIR_SUBFOLDER, self.pairfile)
        for scan in self.read_scan_list():
            for ref_view, src_views in self.read_pairs(pair_path):
                metas.append((scan, ref_view, src_views))
        print(f"[DataLoader] Mode:{self.mode} #metas:{len(metas)}")
        return metas

    def read_cam(self, filename):
        intrinsics, extrinsics, depth_min, depth_interval = super().read_cam(filename)
        intrinsics[:2, :] /= 4.0
        return intrinsics, extrinsics, depth_min, depth_interval

    def read_img(self, filename):
        img = super().read_img(filename)
        assert img.shape[:2] == (1200, 1600), img.shape
        return img[:-16, :]  # crop bottom: no intrinsics change needed

    def __getitem__(self, idx):
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, proj_matrices = [], []
        depth_values = None

        for i, vid in enumerate(view_ids):
            img_filename = os.path.join(
                self.datapath, self.IMG_PATTERN.format(scan=scan, vid1=vid + 1, vid=vid)
            )
            cam_filename = os.path.join(self.datapath, self.CAM_PATTERN.format(vid=vid))

            imgs.append(self.read_img(img_filename))
            intrinsics, extrinsics, depth_min, depth_interval = self.read_cam(cam_filename)
            proj_matrices.append(self.compose_proj(intrinsics, extrinsics))

            if i == 0:
                depth_values = np.arange(
                    depth_min,
                    depth_interval * (self.ndepths - 0.5) + depth_min,
                    depth_interval,
                    dtype=np.float32,
                )

        return {
            "imgs": self.stack_views(imgs),
            "proj_matrices": np.stack(proj_matrices),
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }
