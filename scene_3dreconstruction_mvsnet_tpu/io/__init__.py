"""Host-side file I/O: PFM codec, MVS camera/pair text formats, image
pre-processing, and a dependency-free binary PLY writer."""

from .pfm import read_pfm, save_pfm
from .cams import (
    read_cam_file,
    read_camera_parameters,
    write_cam,
    read_pair_file,
)
from .images import (
    read_img,
    read_mask,
    save_mask,
    read_rescale_crop_img,
)
from .ply import write_ply

__all__ = [
    "read_pfm",
    "save_pfm",
    "read_cam_file",
    "read_camera_parameters",
    "write_cam",
    "read_pair_file",
    "read_img",
    "read_mask",
    "save_mask",
    "read_rescale_crop_img",
    "write_ply",
]
