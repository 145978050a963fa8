"""Device mesh construction.

Axes:
  data   — batch data parallelism (the reference's nn.DataParallel
           equivalent, /root/reference/train.py:125; gradients are
           all-reduced over ICI by XLA),
  sweep  — depth-hypothesis parallelism: the cost volume's D axis is
           sharded; the 3D U-Net's depth convolutions get halo exchanges
           inserted by the GSPMD partitioner (the MVS analogue of sequence
           parallelism, SURVEY.md §2c).

The reference is single-process with no collectives; everything here is new
TPU-native capability expressed through jax.sharding so XLA owns collective
placement.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh
import numpy as np


def auto_mesh_shape(n_devices: int, max_sweep: int = 4) -> tuple[int, int]:
    """Factor n_devices into (data, sweep). Prefers giving the sweep axis up
    to ``max_sweep`` ways (cost-volume memory is the binding constraint at
    scale), the remainder to data parallelism."""
    sweep = 1
    for cand in (4, 2):
        if cand <= max_sweep and n_devices % cand == 0:
            sweep = cand
            break
    return n_devices // sweep, sweep


def make_mesh(
    data: int | None = None,
    sweep: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'sweep') mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // sweep
    n = data * sweep
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{sweep} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(data, sweep)
    return Mesh(arr, axis_names=("data", "sweep"))
