"""Multi-host runtime test: 2 processes x 4 virtual CPU devices each, glued
by jax.distributed (SURVEY.md §5 distributed-backend row; the reference has
no multi-process capability at all — nn.DataParallel only,
/root/reference/train.py:125).

Each process initializes the distributed runtime, builds a global
('data','sweep') mesh over all 8 devices via make_global_mesh, assembles a
globally-sharded array from process-local shards, and checks a jitted global
reduction — the collective rides the distributed runtime exactly as a
gradient psum would in the sharded train step.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax
from scene_3dreconstruction_mvsnet_tpu.parallel import (
    initialize_multihost, make_global_mesh,
)

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, jax.devices()
assert len(jax.local_devices()) == 4

mesh = make_global_mesh(sweep=2)
assert mesh.shape == {"data": 4, "sweep": 2}, mesh.shape

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# global [8, 16] array, rows sharded over 'data': each process owns the
# rows living on its 4 local devices (2 data rows x 2 sweep shards)
sharding = NamedSharding(mesh, P("data", None))
global_shape = (8, 16)
full = np.arange(8 * 16, dtype=np.float32).reshape(global_shape)
arr = jax.make_array_from_callback(
    global_shape, sharding, lambda idx: full[idx]
)

total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(arr)
expected = float(full.sum())
got = float(jax.block_until_ready(total))
assert got == expected, (got, expected)
print(f"proc{pid} MULTIHOST-OK {got}")
"""


def test_two_process_cpu_multihost(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} MULTIHOST-OK" in out, out[-3000:]
