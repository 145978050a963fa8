"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from scene_3dreconstruction_mvsnet_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from scene_3dreconstruction_mvsnet_tpu.parallel.mesh import auto_mesh_shape
from scene_3dreconstruction_mvsnet_tpu.parallel.sharding import volume_sharding
from scene_3dreconstruction_mvsnet_tpu.train import (
    TrainState,
    make_optimizer,
    make_train_step,
)


def test_auto_mesh_shape():
    assert auto_mesh_shape(8) == (2, 4)
    assert auto_mesh_shape(8, max_sweep=2) == (4, 2)
    assert auto_mesh_shape(1) == (1, 1)
    assert auto_mesh_shape(2) == (1, 2)


def _tiny_batch(rng, B, V=3, H=32, W=32, D=8):
    from tests.test_sampling import _random_projection

    projs = np.stack([_random_projection(rng, 1)[0] for _ in range(V)])[None]
    projs = np.broadcast_to(projs, (B, V, 4, 4)).copy()
    return {
        "imgs": rng.rand(B, V, H, W, 3).astype(np.float32),
        "proj_matrices": projs.astype(np.float32),
        "depth_values": np.broadcast_to(
            np.linspace(40, 60, D, dtype=np.float32)[None], (B, D)
        ).copy(),
        "depth": rng.uniform(40, 60, (B, H // 4, W // 4)).astype(np.float32),
        "mask": np.ones((B, H // 4, W // 4), np.float32),
    }


@pytest.mark.slow
def test_sharded_train_step_runs(rng):
    assert jax.device_count() >= 8
    mesh = make_mesh(data=4, sweep=2)
    model = MVSNet(volume_sharding=volume_sharding(mesh))
    batch = _tiny_batch(rng, B=4)

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"]),
        jnp.asarray(batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"]),
    )
    tx = make_optimizer(lambda s: 1e-3)
    state, train_step, shard_fn = make_sharded_train_step(model, tx, mesh, variables)
    state, aux = train_step(state, shard_fn(batch))
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 1


def test_sharded_eval_matches_single_device(rng):
    """Multi-device eval (VERDICT r3 item 6): the view axis sharded over
    'data' must produce the same depth maps as the single-device infer, and
    the mesh-sharded whole-scan filter the same masks/fused depths as the
    serial-chunk fuse_scan."""
    from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_scan
    from scene_3dreconstruction_mvsnet_tpu.parallel import make_sharded_infer
    from scene_3dreconstruction_mvsnet_tpu.train import make_infer_step

    B, V, H, W, D = 8, 3, 32, 32, 8
    batch = _tiny_batch(rng, B=B, V=V, H=H, W=W, D=D)
    # distinct per-sample projs so every device computes different views
    per = np.stack(
        [_tiny_batch(rng, B=1, V=V, H=H, W=W, D=D)["proj_matrices"][0]
         for _ in range(B)]
    )
    batch["proj_matrices"] = per

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"][:1]),
        jnp.asarray(batch["proj_matrices"][:1]),
        jnp.asarray(batch["depth_values"][:1]),
    )

    infer = make_infer_step(model)
    out0 = infer(
        variables, jnp.asarray(batch["imgs"]),
        jnp.asarray(batch["proj_matrices"]), jnp.asarray(batch["depth_values"]),
    )
    d0 = np.asarray(out0["depth"])

    mesh = make_mesh(data=8, sweep=1)
    var_rep, infer_sh, shard_fn = make_sharded_infer(model, mesh, variables)
    out1 = infer_sh(var_rep, *shard_fn(
        batch["imgs"], batch["proj_matrices"], batch["depth_values"]
    ))
    d1 = np.asarray(out1["depth"])
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-4)

    # fuse: sharded ref-view axis == serial-chunk reference implementation
    Ks = np.broadcast_to(
        np.array([[W * 0.7, 0, W / 8], [0, W * 0.7, H / 8], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy()
    Es = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    for v in range(B):
        Es[v, 0, 3] = -1.5 * v
    confs = rng.rand(B, H // 4, W // 4).astype(np.float32)
    depths = d0  # [B, H/4, W/4]
    pair_data = [(r, [s for s in range(B) if s != r][:3]) for r in range(B)]
    kw = dict(NviewFilter=3, photomask=0.4, geomask=1,
              condmask_pixel=4.0, condmask_depth=0.1)
    plain = fuse_scan(depths, confs, Ks, Es, pair_data, list(range(B)),
                      ref_chunk=2, **kw)
    sharded = fuse_scan(depths, confs, Ks, Es, pair_data, list(range(B)),
                        ref_chunk=1, mesh=mesh, **kw)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(a["photo_mask"], b["photo_mask"])
        np.testing.assert_array_equal(a["geo_mask"], b["geo_mask"])
        np.testing.assert_array_equal(a["final_mask"], b["final_mask"])
        np.testing.assert_allclose(
            a["depth_est_averaged"], b["depth_est_averaged"], rtol=1e-6
        )


@pytest.mark.slow
def test_sharded_matches_single_device(rng):
    """DP+sweep sharded step must produce the same loss and updated params
    as the unsharded step on identical inputs. SGD rather than Adam: Adam's
    first step is ~±lr*sign(grad), which amplifies reduction-order noise on
    near-zero gradients into full ±lr flips."""
    import optax

    batch = _tiny_batch(rng, B=4)
    model_plain = MVSNet()
    variables = model_plain.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"]),
        jnp.asarray(batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"]),
    )
    tx = optax.sgd(1e-3)

    state0 = TrainState.create(variables, tx)
    step0 = make_train_step(model_plain)
    state0, aux0 = step0(state0, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(data=2, sweep=2, devices=jax.devices()[:4])
    model_sh = MVSNet(volume_sharding=volume_sharding(mesh))
    state1, step1, shard_fn = make_sharded_train_step(model_sh, tx, mesh, variables)
    state1, aux1 = step1(state1, shard_fn(batch))

    np.testing.assert_allclose(float(aux0["loss"]), float(aux1["loss"]), rtol=1e-4)
    a = jax.tree.leaves(state0.params)
    b = jax.tree.leaves(state1.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


@pytest.mark.slow
def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    # abstract compile check (the driver does the same single-chip)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
