"""Batched projective geometry in jnp — the algebra under the plane sweep,
back-projection, and geometric-consistency filtering."""

from .transforms import (
    compose_projection_matrix,
    invert_rigid,
    invert_4x4,
    pixel_grid,
    pixel_grid_centered,
    depth_to_world_points,
    project_points,
    plane_sweep_coords,
)

__all__ = [
    "compose_projection_matrix",
    "invert_rigid",
    "invert_4x4",
    "pixel_grid",
    "pixel_grid_centered",
    "depth_to_world_points",
    "project_points",
    "plane_sweep_coords",
]
