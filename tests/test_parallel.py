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
