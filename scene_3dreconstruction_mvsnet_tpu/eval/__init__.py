from .filtering import (
    reproject_with_depth,
    check_geometric_consistency,
    geometric_filter_stack,
    fuse_reference_view,
    fuse_scan,
)
from .depth_gen import save_depth
from .fusion import filter_depth
from .scene_kit import (
    BBox,
    get_frame_bbox,
    camera_poses,
    voxel_down_sample,
    remove_statistical_outliers,
    postprocess_cloud,
)

__all__ = [
    "reproject_with_depth",
    "check_geometric_consistency",
    "geometric_filter_stack",
    "fuse_reference_view",
    "fuse_scan",
    "save_depth",
    "filter_depth",
    "BBox",
    "get_frame_bbox",
    "camera_poses",
    "voxel_down_sample",
    "remove_statistical_outliers",
    "postprocess_cloud",
]
