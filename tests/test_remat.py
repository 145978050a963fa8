"""Remat option: gradients must be identical with and without sweep
rematerialization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.models import MVSNet, mvsnet_loss


@pytest.mark.slow
def test_remat_gradients_match(rng):
    from tests.test_sampling import _random_projection

    B, V, H, W, D = 1, 3, 32, 32, 8
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    projs = jnp.asarray(
        np.broadcast_to(
            np.stack([_random_projection(rng, 1)[0] for _ in range(V)])[None],
            (B, V, 4, 4),
        ).copy()
    )
    dv = jnp.asarray(np.linspace(40, 60, D, dtype=np.float32)[None])
    gt = jnp.asarray(rng.uniform(40, 60, (B, H // 4, W // 4)).astype(np.float32))
    mask = jnp.ones((B, H // 4, W // 4), jnp.float32)

    def grads(model):
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, projs, dv, train=True, mutable=["batch_stats"],
            )
            return mvsnet_loss(out["depth"], gt, mask)

        return jax.grad(loss_fn)(variables["params"])

    g0 = grads(MVSNet())
    g1 = grads(MVSNet(remat=True))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
