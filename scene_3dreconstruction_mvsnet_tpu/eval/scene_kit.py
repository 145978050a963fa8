"""Scene kit: bin bounding boxes, camera poses, and point-cloud
post-processing (SURVEY.md component 29).

The reference builds these as Open3D objects for interactive windows
(/root/reference/eval.py:159-250) and post-processes fused clouds with
statistical outlier removal + 5 mm voxel downsampling
(/root/reference/eval.py:494-497, :832-839). Open3D is not part of this
framework's dependency set, so the geometry is represented as plain numpy
(and the filters implemented with spatial hashing); ``to_open3d`` adapters
are provided for environments that have open3d installed.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BBox(NamedTuple):
    min_bound: np.ndarray  # [3]
    max_bound: np.ndarray  # [3]

    def contains(self, points: np.ndarray) -> np.ndarray:
        """points [N, 3] -> bool [N]."""
        return np.all((points >= self.min_bound) & (points <= self.max_bound), axis=1)


def get_frame_bbox(
    dims: tuple[float, float, float] = (0.57, 0.37, 0.22),
    delta: tuple[float, float, float] = (0.0, 0.0, 0.0),
    scale: float = 1.0,
    context: str | None = None,
) -> tuple[BBox, BBox]:
    """Bin bounding boxes in mm: (inner walls, outer walls with 2 cm wall
    offset). Named contexts override dims/delta like the reference's
    presets (/root/reference/eval.py:171-183)."""
    if context is not None:
        if "overhead03" in context or "overhead02" in context:
            dims = (0.57, 0.37, 0.22)
            delta = (0.08, 0.03, 0.0)
        else:
            dims = (0.57, 0.37, 0.22)
            delta = (0.0, 0.0, 0.0)

    dims_mm = np.asarray(dims, dtype=np.float64) * 1000.0 * scale
    delta_mm = np.asarray(delta, dtype=np.float64) * 1000.0 * scale

    min_b = -dims_mm / 2.0
    max_b = dims_mm / 2.0
    max_b[2] -= min_b[2]
    min_b[2] = 0.0
    inner = BBox(min_b + delta_mm, max_b + delta_mm)

    wall = 20.0  # mm
    outer = BBox(
        inner.min_bound - np.array([wall, wall, wall]),
        inner.max_bound + np.array([wall, wall, 0.0]),
    )
    return inner, outer


def invert_pose(rotation: np.ndarray, translation: np.ndarray):
    """(R | t) world->camera  ->  camera->world (R^T | -R^T t)
    (/root/reference/eval.py:220-224)."""
    rot = rotation.T
    return rot, -rot @ translation


def camera_poses(cam_extrinsics: list[np.ndarray]) -> list[dict]:
    """Camera centers + viewing directions for visualization (the arrow
    meshes of /root/reference/eval.py:228-250, as data)."""
    cams = []
    for i, E in enumerate(cam_extrinsics):
        R, t = invert_pose(E[:3, :3], E[:3, 3])
        cams.append(
            {
                "center": R @ np.zeros(3) + t,  # camera origin in world
                "direction": R @ np.array([0.0, 0.0, 1.0]),  # optical axis
                "highlight": i == 0,
            }
        )
    return cams


def voxel_down_sample(
    points: np.ndarray, colors: np.ndarray | None = None, voxel_size: float = 5.0
) -> tuple[np.ndarray, np.ndarray | None]:
    """Average points (and colors) within voxel_size cells."""
    points = np.asarray(points, dtype=np.float64)
    if points.shape[0] == 0:
        return points.astype(np.float32), colors
    keys = np.floor(points / voxel_size).astype(np.int64)
    # hash voxel coords to group
    _, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    n_vox = counts.shape[0]
    sums = np.zeros((n_vox, 3), dtype=np.float64)
    np.add.at(sums, inverse, points)
    out_points = (sums / counts[:, None]).astype(np.float32)
    out_colors = None
    if colors is not None:
        csums = np.zeros((n_vox, colors.shape[1]), dtype=np.float64)
        np.add.at(csums, inverse, colors.astype(np.float64))
        out_colors = (csums / counts[:, None]).astype(colors.dtype)
    return out_points, out_colors


def remove_statistical_outliers(
    points: np.ndarray, nb_neighbors: int = 20, std_ratio: float = 2.0,
    cell_size: float | None = None,
) -> np.ndarray:
    """Grid-accelerated statistical outlier removal -> keep mask [N].

    Approximates Open3D's remove_statistical_outlier: a point is kept if
    its mean distance to ~nb_neighbors nearby points is below
    mean + std_ratio * std over all points. Neighbors are drawn from the
    3x3x3 cell neighborhood of a spatial hash (cell ~ local density scale).
    """
    points = np.asarray(points, dtype=np.float64)
    n = points.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    if cell_size is None:
        bbox_span = np.ptp(points, axis=0)
        vol = float(np.prod(np.maximum(bbox_span, 1e-6)))
        cell_size = max((vol / max(n, 1)) ** (1.0 / 3.0) * nb_neighbors ** (1 / 3.0), 1e-6)

    keys = np.floor(points / cell_size).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    bounds = np.searchsorted(inverse[order], np.arange(uniq.shape[0] + 1))
    cell_index = {tuple(c): i for i, c in enumerate(uniq)}

    rng = np.random.RandomState(0)
    mean_dists = np.full(n, np.inf)
    for ci, cell in enumerate(uniq):
        members = order[bounds[ci]:bounds[ci + 1]]
        # candidate pool: this cell + 26 neighbors
        pool = [members]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    j = cell_index.get((cell[0] + dx, cell[1] + dy, cell[2] + dz))
                    if j is not None:
                        pool.append(order[bounds[j]:bounds[j + 1]])
        cand = np.concatenate(pool)
        if cand.shape[0] > 8 * nb_neighbors:
            cand = cand[rng.choice(cand.shape[0], 8 * nb_neighbors, replace=False)]
        if cand.shape[0] < 2:
            continue
        d = np.linalg.norm(points[members, None] - points[None, cand], axis=-1)
        # exclude self distance (0) by using partition over k+1
        k = min(nb_neighbors, d.shape[1] - 1)
        part = np.partition(d, k, axis=1)[:, 1 : k + 1]
        mean_dists[members] = part.mean(axis=1)

    finite = np.isfinite(mean_dists)
    mu = mean_dists[finite].mean() if finite.any() else 0.0
    sd = mean_dists[finite].std() if finite.any() else 0.0
    return mean_dists <= mu + std_ratio * sd


def postprocess_cloud(
    points: np.ndarray,
    colors: np.ndarray | None,
    *,
    crop_bbox: BBox | None = None,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
    voxel_size: float = 5.0,
) -> tuple[np.ndarray, np.ndarray | None]:
    """The reference's fused-cloud pipeline: crop to the outer bin bbox,
    statistical outlier removal, voxel downsample
    (/root/reference/eval.py:494-497, :832-839)."""
    if crop_bbox is not None and points.shape[0]:
        keep = crop_bbox.contains(points)
        points = points[keep]
        colors = colors[keep] if colors is not None else None
    if points.shape[0]:
        keep = remove_statistical_outliers(points, nb_neighbors, std_ratio)
        points = points[keep]
        colors = colors[keep] if colors is not None else None
    return voxel_down_sample(points, colors, voxel_size)


def to_open3d(points: np.ndarray, colors: np.ndarray | None = None):
    """Optional Open3D adapter for interactive environments."""
    import open3d as o3d  # noqa: F401 — optional dependency

    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(points, dtype=np.float64))
    if colors is not None:
        c = np.asarray(colors, dtype=np.float64)
        if c.max() > 1.0:
            c = c / 255.0
        pcd.colors = o3d.utility.Vector3dVector(c)
    return pcd
