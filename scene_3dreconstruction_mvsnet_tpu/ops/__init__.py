"""TPU compute ops: bilinear sampling / homography warp, streaming
plane-sweep variance, and fused softmax depth regression + confidence."""

from .sampling import (
    grid_sample_2d,
    bilinear_sample_2d,
    warp_src_feature,
)
from .plane_sweep import cost_volume_variance
from .regression import (
    depth_regression,
    photometric_confidence,
    regress_depth_and_confidence,
)

__all__ = [
    "grid_sample_2d",
    "bilinear_sample_2d",
    "warp_src_feature",
    "cost_volume_variance",
    "depth_regression",
    "photometric_confidence",
    "regress_depth_and_confidence",
]
