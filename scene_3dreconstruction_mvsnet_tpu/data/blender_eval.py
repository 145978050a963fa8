"""Legacy Blender (BDS) eval dataset — the 1200x1600 variant.

Behavioral parity with /root/reference/datasets/blender_eval.py (identical
to dtu_yao_eval except the path layout and 0-indexed image files)."""

from __future__ import annotations

from .dtu_yao_eval import MVSDataset as _DTUEval


class MVSDataset(_DTUEval):
    PAIR_SUBFOLDER = "Cameras_1200x1600"
    IMG_PATTERN = "Rectified_1200x1600/{scan}/rect_C{vid:0>3}_L00.png"
    CAM_PATTERN = "Cameras_1200x1600/{vid:0>8}_cam.txt"
