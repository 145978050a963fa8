"""Multi-host EVAL test (VERDICT r5 item 5): stage A's sharded inference +
the mesh-sharded fuse_scan across 2 processes x 4 virtual CPU devices via
jax.distributed, pinned against the single-process run.

This is the eval analogue of tests/test_multihost.py's train-step test: the
--data_shards surface (parallel/sharding.py::make_sharded_infer, "no
cross-view collectives") verified where per-process placement can actually
diverge — global-array assembly per process, GSPMD partitioning across the
process boundary, and the replicated-output gather fuse_scan needs when the
mesh spans hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_EVAL_WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
data_npz = sys.argv[4]
out_npz = sys.argv[5]

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from scene_3dreconstruction_mvsnet_tpu.parallel import (
    initialize_multihost, make_global_mesh, make_sharded_infer,
)
from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_scan

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
mesh = make_global_mesh(sweep=1)
assert mesh.shape == {"data": 8, "sweep": 1}, mesh.shape

d = np.load(data_npz)
imgs, projs, dv = d["imgs"], d["projs"], d["dv"]
Ks, Es = d["Ks"], d["Es"]
pair_data = [(int(r), list(map(int, s))) for r, s in zip(d["pair_ref"], d["pair_src"])]

model = MVSNet()
rep = NamedSharding(mesh, P())
init_args = [
    jax.make_array_from_callback(v.shape, rep, lambda idx, v=v: v[idx])
    for v in (imgs[:1], projs[:1], dv[:1])
]
# AOT-compile before any cross-process collective executes, then barrier —
# same Gloo-deadline discipline as tests/test_multihost.py
from jax._src import distributed

init_fn = jax.jit(model.init, out_shardings=rep)
init_exe = init_fn.lower(jax.random.PRNGKey(0), *init_args).compile()
distributed.global_state.client.wait_at_barrier("init_compiled", 600_000)
variables = init_exe(jax.random.PRNGKey(0), *init_args)

variables, infer, _shard_fn = make_sharded_infer(model, mesh, variables)
bs = NamedSharding(mesh, P("data"))
g = lambda v, sh: jax.make_array_from_callback(v.shape, sh, lambda idx, v=v: v[idx])
gimgs, gprojs, gdv = g(imgs, bs), g(projs, bs), g(dv, bs)

# replicate the outputs so every process can fetch full depth/conf maps
infer_rep = jax.jit(lambda v, i, p, d: infer(v, i, p, d), out_shardings=rep)
infer_exe = infer_rep.lower(variables, gimgs, gprojs, gdv).compile()
distributed.global_state.client.wait_at_barrier("infer_compiled", 600_000)
out = infer_exe(variables, gimgs, gprojs, gdv)
depths = np.asarray(out["depth"])
confs = np.asarray(out["photometric_confidence"])

results = fuse_scan(
    depths, confs, Ks, Es, pair_data, list(range(len(depths))),
    NviewFilter=2, photomask=0.0, geomask=1,
    condmask_pixel=6.0, condmask_depth=0.5, mesh=mesh,
)
if pid == 0:
    np.savez(
        out_npz,
        depth=depths, conf=confs,
        photo=np.stack([r["photo_mask"] for r in results]),
        geo=np.stack([r["geo_mask"] for r in results]),
        final=np.stack([r["final_mask"] for r in results]),
        davg=np.stack([r["depth_est_averaged"] for r in results]),
    )
print(f"proc{pid} EVAL-MULTIHOST-OK {float(depths.mean()):.6e}")
"""


@pytest.mark.slow
def test_two_process_eval_stage_a_and_fuse(tmp_path):
    """Sharded infer + mesh-sharded fuse over 2 processes x 4 devices must
    match the single-process (local 8-device) run: depth maps allclose,
    masks equal."""
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import SyntheticRig
    from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_scan
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train.state import make_infer_step

    R, V, H, W, D = 8, 3, 64, 96, 16
    rig = SyntheticRig(n_views=R, img_hw=(H, W), baseline=2.0)
    rng = np.random.RandomState(0)
    view_imgs = rng.rand(R, H, W, 3).astype(np.float32)
    Ks = np.stack([rig.K for _ in range(R)]).astype(np.float32)
    Es = np.stack([rig.extrinsics(v) for v in range(R)]).astype(np.float32)

    def proj(v):
        P4 = Es[v].copy()
        K4 = Ks[v].copy()
        K4[:2] /= 4.0  # feature-res intrinsics, as the datasets emit
        P4[:3, :4] = K4 @ Es[v][:3, :4]
        return P4

    imgs = np.stack(
        [np.stack([view_imgs[(r + j) % R] for j in range(V)]) for r in range(R)]
    )
    projs = np.stack(
        [np.stack([proj((r + j) % R) for j in range(V)]) for r in range(R)]
    )
    dv = np.broadcast_to(
        np.linspace(rig.z0 * 0.7, rig.z0 * 1.4, D, dtype=np.float32), (R, D)
    ).copy()
    pair_ref = np.arange(R, dtype=np.int32)
    pair_src = np.stack(
        [np.array([(r + 1) % R, (r + 2) % R], np.int32) for r in range(R)]
    )
    data_npz = tmp_path / "eval_inputs.npz"
    np.savez(data_npz, imgs=imgs, projs=projs, dv=dv, Ks=Ks, Es=Es,
             pair_ref=pair_ref, pair_src=pair_src)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "eval_worker.py"
    worker.write_text(_EVAL_WORKER)
    out_npz = tmp_path / "eval_out.npz"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax as _jax

    env["JAX_COMPILATION_CACHE_DIR"] = (
        _jax.config.jax_compilation_cache_dir or ""
    )
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(data_npz), str(out_npz)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)

    # expected: identical pipeline on this process's own devices, AFTER the
    # workers finish (1-core box: a concurrent parent compile starves the
    # workers' Gloo context exchange past its 30 s deadline)
    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), jnp.asarray(projs[:1]),
        jnp.asarray(dv[:1]),
    )
    infer = make_infer_step(model)
    res = infer(variables, jnp.asarray(imgs), jnp.asarray(projs),
                jnp.asarray(dv))
    want_depth = np.asarray(res["depth"])
    want_conf = np.asarray(res["photometric_confidence"])
    pair_data = [(int(r), list(map(int, s))) for r, s in zip(pair_ref, pair_src)]
    want = fuse_scan(
        want_depth, want_conf, Ks, Es, pair_data, list(range(R)),
        NviewFilter=2, photomask=0.0, geomask=1,
        condmask_pixel=6.0, condmask_depth=0.5,
    )

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} EVAL-MULTIHOST-OK" in out, out[-3000:]

    got = np.load(out_npz)
    scale = max(1e-6, np.abs(want_depth).max())
    np.testing.assert_allclose(got["depth"], want_depth, atol=1e-5 * scale)
    np.testing.assert_allclose(got["conf"], want_conf, atol=1e-5)
    np.testing.assert_array_equal(
        got["photo"], np.stack([r["photo_mask"] for r in want])
    )
    np.testing.assert_array_equal(
        got["geo"], np.stack([r["geo_mask"] for r in want])
    )
    np.testing.assert_array_equal(
        got["final"], np.stack([r["final_mask"] for r in want])
    )
