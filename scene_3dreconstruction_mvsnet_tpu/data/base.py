"""Dataset base class and shared camera-file logic.

All datasets return dict samples of numpy arrays in channels-last layout
(imgs [V, H, W, 3]); the reference's channels-first layout is a torch
convention with no TPU benefit. Field names and semantics otherwise match
the reference's sample dicts (SURVEY.md §1 L1):

train/val/test:  {imgs, proj_matrices, depth, depth_values, mask}
eval:            {imgs, proj_matrices, depth_values, filename
                  [, intrinsics, extrinsics]}
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..io.cams import read_cam_file, read_pair_file
from ..io.pfm import read_pfm
from ..io.images import read_img, read_img_cached


class MVSDatasetBase:
    """Map-style dataset: __len__ + __getitem__ -> dict of numpy arrays."""

    def __init__(
        self,
        datapath: str,
        listfile: str,
        mode: str,
        nviews: int,
        ndepths: int = 192,
        interval_scale: float = 1.06,
        **kwargs: Any,
    ) -> None:
        self.datapath = datapath
        self.listfile = listfile
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.pairfile = kwargs.get("pairfile", "pair.txt")
        # optional pre-decoded image cache dir (multi-epoch training reads
        # the same PNGs every epoch; PNG decode is ~12x slower than np.load
        # of the decoded array — scripts/profile_input.py)
        self.img_cache = kwargs.get("img_cache") or None
        self.kwargs = kwargs
        self.metas: list = []

    # -- shared helpers ----------------------------------------------------
    def read_scan_list(self) -> list[str]:
        with open(self.listfile) as f:
            return [line.rstrip() for line in f.readlines() if line.strip()]

    def read_cam(self, filename: str):
        return read_cam_file(filename, interval_scale=self.interval_scale)

    @staticmethod
    def compose_proj(intrinsics: np.ndarray, extrinsics: np.ndarray) -> np.ndarray:
        proj = extrinsics.copy()
        proj[:3, :4] = intrinsics @ proj[:3, :4]
        return proj

    def read_img(self, filename: str) -> np.ndarray:
        if self.img_cache:
            return read_img_cached(filename, self.img_cache)
        return read_img(filename)

    @staticmethod
    def read_depth(filename: str) -> np.ndarray:
        return np.asarray(read_pfm(filename)[0], dtype=np.float32)

    def read_pairs(self, pair_path: str):
        return read_pair_file(pair_path)

    # -- protocol ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict:
        raise NotImplementedError

    @staticmethod
    def stack_views(imgs: list[np.ndarray], dtype=np.float32) -> np.ndarray:
        """[V] list of HxWx3 -> [V, H, W, 3] ``dtype`` (channels-last).

        Preallocates and copies each view once: ``np.stack(...).astype(f32)``
        copies the full batch TWICE, which at DTU-full resolution was ~60% of
        the per-sample host time on this 1-core box (scripts/profile_input.py).
        ``dtype=np.uint8`` carries the eval pipeline's u8-native images.
        """
        out = np.empty((len(imgs),) + np.shape(imgs[0]), dtype)
        for i, im in enumerate(imgs):
            out[i] = im
        return out
