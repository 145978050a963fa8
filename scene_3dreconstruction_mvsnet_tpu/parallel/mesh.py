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


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime for multi-host execution.

    The TPU-native replacement for a NCCL/MPI communicator bootstrap (the
    reference has none — nn.DataParallel is single-process,
    /root/reference/train.py:125). After this returns, ``jax.devices()``
    is the GLOBAL device list across all processes and ``make_mesh`` /
    ``make_global_mesh`` build meshes spanning hosts; XLA routes
    collectives over ICI within a slice and DCN across slices.

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID), or are
    auto-detected on real TPU pods. Call once, before any backend use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_global_mesh(sweep: int = 1, max_sweep: int = 4) -> Mesh:
    """Process-count-aware mesh over ALL global devices (multi-host safe).

    Uses the global device list, ordered so each process's devices are
    contiguous along the data axis — gradient psums ride ICI, and each
    process feeds the batch rows owned by its local devices."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if sweep <= 0:
        _, sweep = auto_mesh_shape(n, max_sweep=max_sweep)
    if n % sweep:
        raise ValueError(f"{n} global devices not divisible by sweep={sweep}")
    return make_mesh(data=n // sweep, sweep=sweep, devices=devices)


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
