"""Multi-host runtime test: 2 processes x 4 virtual CPU devices each, glued
by jax.distributed (SURVEY.md §5 distributed-backend row; the reference has
no multi-process capability at all — nn.DataParallel only,
/root/reference/train.py:125).

Each process initializes the distributed runtime, builds a global
('data','sweep') mesh over all 8 devices via make_global_mesh, assembles a
globally-sharded array from process-local shards, and checks a jitted global
reduction — the collective rides the distributed runtime exactly as a
gradient psum would in the sharded train step.

test_two_process_full_train_step goes further: the REAL MVSNet sharded
train step (make_sharded_train_step, params replicated, batch over 'data',
cost-volume depth over 'sweep') runs two SGD steps over the 2-process
global mesh, and the parent asserts the per-step losses and final params
norm match the same recipe on its own single-process 8-device mesh.
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


_TRAIN_WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from scene_3dreconstruction_mvsnet_tpu.parallel import (
    initialize_multihost, make_global_mesh, make_sharded_train_step,
)
from scene_3dreconstruction_mvsnet_tpu.parallel.sharding import (
    _BATCH_FIELDS, volume_sharding,
)
from tests.test_parallel import _tiny_batch

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
mesh = make_global_mesh(sweep=2)
assert mesh.shape == {"data": 4, "sweep": 2}, mesh.shape

batch_np = _tiny_batch(np.random.RandomState(0), B=4)
model = MVSNet(volume_sharding=volume_sharding(mesh))

# global batch arrays: every process holds the full value; each assembles
# the shards its local devices own
bs = NamedSharding(mesh, P("data"))
batch = {
    k: jax.make_array_from_callback(v.shape, bs, lambda idx, v=v: v[idx])
    for k, v in batch_np.items()
}
assert all(k in _BATCH_FIELDS for k in batch)

# init on replicated global inputs so the variables come out as global
# (replicated) arrays usable from every process
rep = NamedSharding(mesh, P())
init_args = [
    jax.make_array_from_callback(v.shape, rep, lambda idx, v=v: v[idx])
    for v in (batch_np["imgs"], batch_np["proj_matrices"],
              batch_np["depth_values"])
]

# The first EXECUTION of a cross-process collective creates its Gloo
# context, whose peer-exchange has a hard 30 s deadline. Big XLA:CPU
# compiles on this 1-core box can skew the two workers by minutes (worse
# when the persistent compile cache holds entries from a different
# machine: one process loads, the other recompiles). So: compile
# everything AOT first (compilation is process-local, no collectives),
# then rendezvous on a coordination-service barrier (10-min budget),
# and only then execute — both processes hit the Gloo exchange within
# milliseconds of each other.
from jax._src import distributed

init_fn = jax.jit(model.init, out_shardings=rep)
init_exe = init_fn.lower(jax.random.PRNGKey(0), *init_args).compile()
distributed.global_state.client.wait_at_barrier("init_compiled", 600_000)
variables = init_exe(jax.random.PRNGKey(0), *init_args)

state, train_step, _ = make_sharded_train_step(
    model, optax.sgd(1e-3), mesh, variables
)
step_exe = train_step.lower(state, batch).compile()
norm_fn = jax.jit(optax.global_norm, out_shardings=rep)
norm_exe = norm_fn.lower(state.params).compile()
distributed.global_state.client.wait_at_barrier("step_compiled", 600_000)

losses = []
for _ in range(2):
    state, aux = step_exe(state, batch)
    losses.append(float(jax.block_until_ready(aux["loss"])))
pnorm = float(norm_exe(state.params))
print(f"proc{pid} TRAINSTEP-OK {losses[0]:.6e} {losses[1]:.6e} {pnorm:.6e}")
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
    # same (host-CPU-keyed) cache dir the parent uses — see conftest.py
    import jax as _jax

    env["JAX_COMPILATION_CACHE_DIR"] = (
        _jax.config.jax_compilation_cache_dir or ""
    )
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


@pytest.mark.slow
def test_two_process_full_train_step(tmp_path):
    """The real MVSNet sharded train step over 2 processes x 4 devices:
    losses and final params norm must match the single-process 8-device
    run of the identical recipe (same seeds, same batch, SGD)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.parallel import (
        make_mesh, make_sharded_train_step,
    )
    from scene_3dreconstruction_mvsnet_tpu.parallel.sharding import (
        volume_sharding,
    )
    from tests.test_parallel import _tiny_batch

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # same (host-CPU-keyed) cache dir the parent uses — see conftest.py
    import jax as _jax

    env["JAX_COMPILATION_CACHE_DIR"] = (
        _jax.config.jax_compilation_cache_dir or ""
    )
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
        out, _ = p.communicate(timeout=560)
        outs.append(out)

    # expected: identical recipe on this process's own 8-device mesh.
    # Computed AFTER the workers finish — this box has 1 core, and a
    # concurrent parent compile starves the workers' Gloo collective
    # context exchange past its hard 30 s deadline.
    batch_np = _tiny_batch(np.random.RandomState(0), B=4)
    mesh = make_mesh(data=4, sweep=2)
    model = MVSNet(volume_sharding=volume_sharding(mesh))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_np["imgs"]),
        jnp.asarray(batch_np["proj_matrices"]),
        jnp.asarray(batch_np["depth_values"]),
    )
    state, train_step, shard_fn = make_sharded_train_step(
        model, optax.sgd(1e-3), mesh, variables
    )
    want = []
    sharded = shard_fn(batch_np)
    for _ in range(2):
        state, aux = train_step(state, sharded)
        want.append(float(aux["loss"]))
    want.append(float(optax.global_norm(state.params)))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if "TRAINSTEP-OK" in l]
        assert line, out[-3000:]
        got = [float(x) for x in line[0].split()[-3:]]
        np.testing.assert_allclose(got, want, rtol=1e-4)
