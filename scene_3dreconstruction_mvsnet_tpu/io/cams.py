"""MVS camera / pair text formats.

Format (as produced by the Yao-Yao DTU preprocessing and the reference's
outputs; parsers at /root/reference/datasets/dtu_yao.py:47-62 and
/root/reference/eval.py:89-156):

cam file:
    extrinsic
    <4x4 world->camera matrix, row per line>
    <blank>
    intrinsic
    <3x3 K matrix, row per line>
    <blank>
    <depth_min> <depth_interval> [<num_depth> <depth_max>]

pair file:
    <num_viewpoints>
    then per viewpoint two lines:
        <ref_view_id>
        <n_src> <src_id0> <score0> <src_id1> <score1> ...
"""

from __future__ import annotations

import numpy as np


def read_cam_file(
    filename: str, interval_scale: float = 1.0
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Parse a cam txt file -> (intrinsics[3,3], extrinsics[4,4], depth_min,
    depth_interval * interval_scale)."""
    with open(filename) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsics = np.fromstring(
        " ".join(lines[1:5]), dtype=np.float32, sep=" "
    ).reshape(4, 4)
    intrinsics = np.fromstring(
        " ".join(lines[7:10]), dtype=np.float32, sep=" "
    ).reshape(3, 3)
    fields = lines[11].split()
    depth_min = float(fields[0])
    depth_interval = float(fields[1]) * interval_scale
    return intrinsics, extrinsics, depth_min, depth_interval


def read_camera_parameters(filename: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse only (intrinsics, extrinsics) — the eval-filter variant
    (/root/reference/eval.py:89-104)."""
    intrinsics, extrinsics, _, _ = read_cam_file(filename)
    return intrinsics, extrinsics


def write_cam(filename: str, K: np.ndarray, R: np.ndarray, depth_params) -> None:
    """Write a cam file in MVS format (/root/reference/eval.py:107-126).

    K: 3x3 intrinsics; R: 4x4 extrinsics; depth_params: sequence of 4 values
    written on the trailing line.
    """
    with open(filename, "w") as f:
        f.write("extrinsic\n")
        for i in range(4):
            f.write(" ".join(str(R[i][j]) for j in range(4)) + " \n")
        f.write("\n")
        f.write("intrinsic\n")
        for i in range(3):
            f.write(" ".join(str(K[i][j]) for j in range(3)) + " \n")
        f.write("\n")
        f.write(" ".join(str(p) for p in depth_params[:4]) + "\n")


def read_pair_file(filename: str) -> list[tuple[int, list[int]]]:
    """Parse a pair file -> [(ref_view, [src views sorted by score]), ...]."""
    data = []
    with open(filename) as f:
        num_viewpoint = int(f.readline())
        for _ in range(num_viewpoint):
            ref_view = int(f.readline().rstrip())
            src_views = [int(x) for x in f.readline().rstrip().split()[1::2]]
            data.append((ref_view, src_views))
    return data


def write_pair_file(filename: str, pairs: list[tuple[int, list[int]]]) -> None:
    """Inverse of read_pair_file; scores are written as 0 placeholders."""
    with open(filename, "w") as f:
        f.write(f"{len(pairs)}\n")
        for ref_view, src_views in pairs:
            f.write(f"{ref_view}\n")
            f.write(
                f"{len(src_views)} "
                + " ".join(f"{v} 0" for v in src_views)
                + "\n"
            )
