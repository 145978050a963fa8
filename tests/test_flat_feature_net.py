"""FeatureNet(flat=True) parity with the plain path: same param tree, same
outputs (eval + train-mode BN stats), same gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.models.feature_net import FeatureNet


def _setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    ref = FeatureNet()
    flat = FeatureNet(flat=True)
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
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=2e-5 * scale)


def test_train_outputs_and_stats_match():
    x, ref, flat, vs = _setup()
    ya, ma = ref.apply(vs, x, True, mutable=["batch_stats"])
    yb, mb = flat.apply(vs, x, True, mutable=["batch_stats"])
    scale = np.abs(np.asarray(ya)).max()
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), atol=3e-4 * scale)
    for k in ma["batch_stats"]:
        for kk in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mb["batch_stats"][k]["bn"][kk]),
                np.asarray(ma["batch_stats"][k]["bn"][kk]),
                rtol=2e-4, atol=1e-6, err_msg=f"{k}/{kk}",
            )


def test_gradients_match():
    x, ref, flat, vs = _setup()

    def loss(variables, model):
        return jnp.sum(model.apply(variables, x, False) ** 2)

    ga = jax.grad(loss)(vs, ref)
    gb = jax.grad(loss)(vs, flat)
    ok = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max())
        <= 2e-3 * (float(jnp.abs(a).max()) + 1e-6),
        ga, gb,
    )
    assert jax.tree.all(ok)


def test_ragged_width():
    """W not a multiple of the block pixel count."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 84, 3).astype(np.float32))  # 84 = 5x16+4
    ref = FeatureNet()
    flat = FeatureNet(flat=True)
    vs = ref.init(jax.random.PRNGKey(0), x, False)
    a = np.asarray(ref.apply(vs, x, False))
    b = np.asarray(flat.apply(vs, x, False))
    assert a.shape == b.shape == (1, 8, 21, 32)
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=2e-5 * scale)
