"""Blender synthetic (BDS) train/val/test dataset.

Behavioral parity with /root/reference/datasets/blender.py:10-165:
 - pair file under 'Cameras_512x640/',
 - light-sampling DSL ``Nlights="k:total"``: k==0 -> light 0 only; k<0 ->
   fixed light index ``-k``; k>0 -> sample k lights per viewpoint without
   replacement (val mode samples 2 — from range(k), a reference quirk kept),
 - images 'Rectified_512x640/{scan}/rect_C{vid:03d}_L{light:02d}.png',
 - intrinsics divided by 4 *in the loader* (cam files are at image scale),
 - depth/mask read at 512x640 and subsampled [::4, ::4],
 - depth_values endpoint (ndepths - 0.5) * interval.
"""

from __future__ import annotations

import os

import numpy as np

from .base import MVSDatasetBase


def parse_nlights(spec: str) -> tuple[int, int]:
    """'k:total' -> (k, total); tolerates stray parentheses like the
    reference (/root/reference/datasets/blender.py:20-22)."""
    head, tail = spec.split(":")
    k = int(head.replace("(", "").replace(")", ""))
    total = int(tail.replace("(", "").replace(")", ""))
    return k, total


class MVSDataset(MVSDatasetBase):
    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.06, **kwargs):
        super().__init__(datapath, listfile, mode, nviews, ndepths,
                         interval_scale, **kwargs)
        self.Nlights, self.TotLights = parse_nlights(kwargs.get("Nlights", "1:1"))
        # Reference uses the global ``random`` module for light sampling;
        # we take an explicit seed for reproducible dataset composition.
        self._rng = np.random.RandomState(kwargs.get("seed", None))
        assert self.mode in ["train", "val", "test"]
        self.metas = self.build_list()

    def build_list(self):
        metas = []
        pair_path = os.path.join(self.datapath, "Cameras_512x640", self.pairfile)
        for scan in self.read_scan_list():
            for ref_view, src_views in self.read_pairs(pair_path):
                if self.Nlights == 0:
                    metas.append((scan, 0, ref_view, src_views))
                elif self.Nlights < 0:
                    metas.append((scan, -self.Nlights, ref_view, src_views))
                elif self.mode == "val":
                    assert self.Nlights >= 2, "val requires Nlights >= 2"
                    for light_idx in self._rng.choice(self.Nlights, size=2, replace=False):
                        metas.append((scan, int(light_idx), ref_view, src_views))
                else:
                    assert self.Nlights <= self.TotLights, (
                        "requested more lights than the dataset has"
                    )
                    for light_idx in self._rng.choice(
                        self.TotLights, size=self.Nlights, replace=False
                    ):
                        metas.append((scan, int(light_idx), ref_view, src_views))
        print(f"mode: {self.mode}, # metas: {len(metas)}")
        return metas

    def __getitem__(self, idx):
        scan, light_idx, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, proj_matrices = [], []
        depth = mask = depth_values = None

        for i, vid in enumerate(view_ids):
            img_filename = os.path.join(
                self.datapath,
                f"Rectified_512x640/{scan}/rect_C{vid:0>3}_L{light_idx:0>2}.png",
            )
            mask_filename = os.path.join(
                self.datapath, f"Depths_512x640/{scan}/depth_mask_{vid:0>3}.png"
            )
            depth_filename = os.path.join(
                self.datapath, f"Depths_512x640/{scan}/depth_map_{vid:0>3}.pfm"
            )
            cam_filename = os.path.join(
                self.datapath, f"Cameras_512x640/{vid:0>8}_cam.txt"
            )

            imgs.append(self.read_img(img_filename))
            intrinsics, extrinsics, depth_min, depth_interval = self.read_cam(cam_filename)
            intrinsics[:2, :] /= 4.0  # feature-net x4 I/O factor
            proj_matrices.append(self.compose_proj(intrinsics, extrinsics))

            if i == 0:
                depth_values = np.arange(
                    depth_min,
                    depth_min + depth_interval * (self.ndepths - 0.5),
                    depth_interval,
                    dtype=np.float32,
                )
                mask = self.read_img(mask_filename)[::4, ::4]
                depth = self.read_depth(depth_filename)[::4, ::4]

        return {
            "imgs": self.stack_views(imgs),
            "proj_matrices": np.stack(proj_matrices),
            "depth": depth,
            "depth_values": depth_values,
            "mask": mask,
        }
