"""CostRegNet(flat=True) parity with the plain path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.models.cost_reg_net import CostRegNet


def _setup(B=1, D=8, H=16, W=24):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, D, H, W, 32).astype(np.float32))
    ref = CostRegNet()
    flat = CostRegNet(flat=True)
    vs = ref.init(jax.random.PRNGKey(0), x, False)
    return x, ref, flat, vs


def test_param_tree_identical():
    x, ref, flat, vs = _setup()
    vs2 = flat.init(jax.random.PRNGKey(0), x, False)
    shapes = lambda t: jax.tree.map(jnp.shape, t)
    assert jax.tree_util.tree_structure(shapes(vs)) == jax.tree_util.tree_structure(
        shapes(vs2)
    )
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape, vs, vs2))


def test_eval_outputs_match():
    x, ref, flat, vs = _setup()
    a = np.asarray(ref.apply(vs, x, False))
    b = np.asarray(flat.apply(vs, x, False))
    assert a.shape == b.shape
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=5e-5 * scale)


@pytest.mark.slow
def test_train_outputs_and_stats_match():
    x, ref, flat, vs = _setup()
    ya, ma = ref.apply(vs, x, True, mutable=["batch_stats"])
    yb, mb = flat.apply(vs, x, True, mutable=["batch_stats"])
    scale = np.abs(np.asarray(ya)).max()
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), atol=5e-4 * scale)
    for k in ma["batch_stats"]:
        for kk in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mb["batch_stats"][k]["bn"][kk]),
                np.asarray(ma["batch_stats"][k]["bn"][kk]),
                rtol=5e-4, atol=1e-6, err_msg=f"{k}/{kk}",
            )


@pytest.mark.slow
def test_gradients_match():
    x, ref, flat, vs = _setup(D=8, H=8, W=16)

    def loss(variables, model):
        return jnp.sum(model.apply(variables, x, False) ** 2)

    ga = jax.grad(loss)(vs, ref)
    gb = jax.grad(loss)(vs, flat)
    ok = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max())
        <= 3e-3 * (float(jnp.abs(a).max()) + 1e-6),
        ga, gb,
    )
    assert jax.tree.all(ok)
