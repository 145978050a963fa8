from .filtering import (
    reproject_with_depth,
    check_geometric_consistency,
    geometric_filter_stack,
    fuse_reference_view,
)
from .depth_gen import save_depth
from .fusion import filter_depth

__all__ = [
    "reproject_with_depth",
    "check_geometric_consistency",
    "geometric_filter_stack",
    "fuse_reference_view",
    "save_depth",
    "filter_depth",
]
