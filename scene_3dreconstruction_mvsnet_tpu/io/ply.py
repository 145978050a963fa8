"""Minimal dependency-free PLY point-cloud writer.

The reference uses the ``plyfile`` package (/root/reference/eval.py:789-801);
that package is not part of this framework's dependency set, so we emit the
same binary-little-endian vertex-element layout directly (x,y,z float32 +
red,green,blue uint8). Also fixes the reference's latent ``--save_ply`` bug
(/root/reference/eval.py:796 iterates ``.dtype.names`` on a Python list).
"""

from __future__ import annotations

import numpy as np

_VERTEX_DTYPE = np.dtype(
    [
        ("x", "<f4"),
        ("y", "<f4"),
        ("z", "<f4"),
        ("red", "u1"),
        ("green", "u1"),
        ("blue", "u1"),
    ]
)


def write_ply(filename: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """Write an Nx3 float point cloud (with optional Nx3 uint8 colors) as a
    binary-little-endian PLY 'vertex' element."""
    points = np.asarray(points, dtype=np.float32)
    if points.ndim != 2 or points.shape[1] != 3:
        raise ValueError(f"points must be (N, 3), got {points.shape}")
    n = points.shape[0]
    if colors is None:
        colors = np.zeros((n, 3), dtype=np.uint8)
    colors = np.asarray(colors)
    if colors.dtype != np.uint8:
        colors = np.clip(colors, 0, 255).astype(np.uint8)
    if colors.shape != (n, 3):
        raise ValueError(f"colors must be ({n}, 3), got {colors.shape}")

    vertices = np.empty(n, dtype=_VERTEX_DTYPE)
    vertices["x"], vertices["y"], vertices["z"] = points[:, 0], points[:, 1], points[:, 2]
    vertices["red"], vertices["green"], vertices["blue"] = (
        colors[:, 0],
        colors[:, 1],
        colors[:, 2],
    )

    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        "property uchar red\n"
        "property uchar green\n"
        "property uchar blue\n"
        "end_header\n"
    )
    with open(filename, "wb") as f:
        f.write(header.encode("ascii"))
        vertices.tofile(f)


def read_ply(filename: str) -> tuple[np.ndarray, np.ndarray]:
    """Read back a PLY written by write_ply -> (points f32 Nx3, colors u8 Nx3)."""
    with open(filename, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        n = 0
        for line in header_lines:
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
        vertices = np.fromfile(f, dtype=_VERTEX_DTYPE, count=n)
    points = np.stack([vertices["x"], vertices["y"], vertices["z"]], axis=1)
    colors = np.stack([vertices["red"], vertices["green"], vertices["blue"]], axis=1)
    return points, colors
