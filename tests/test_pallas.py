"""Pallas kernel tests (interpret mode on CPU; real-TPU execution is covered
by bench.py / eval runs)."""

import numpy as np
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.ops.pallas.softmax_regression import (
    fused_softmax_regression,
)
from scene_3dreconstruction_mvsnet_tpu.ops import regress_depth_and_confidence


def test_fused_softmax_regression_matches_xla(rng):
    B, D, H, W = 2, 24, 16, 256
    cost = (rng.randn(B, D, H, W) * 3).astype(np.float32)
    dv = np.linspace(425, 905, D, dtype=np.float32)[None].repeat(B, 0)

    ref_depth, ref_conf = regress_depth_and_confidence(
        jnp.asarray(cost), jnp.asarray(dv)
    )
    depth, conf = fused_softmax_regression(
        jnp.asarray(cost), jnp.asarray(dv), interpret=True
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf), rtol=1e-5, atol=1e-5)


def test_fused_softmax_regression_ragged_tiles(rng):
    """H/W not multiples of the tile sizes must still be exact."""
    B, D, H, W = 1, 16, 13, 200
    cost = (rng.randn(B, D, H, W) * 2).astype(np.float32)
    dv = np.linspace(1.0, 2.0, D, dtype=np.float32)[None]
    ref_depth, ref_conf = regress_depth_and_confidence(jnp.asarray(cost), jnp.asarray(dv))
    depth, conf = fused_softmax_regression(jnp.asarray(cost), jnp.asarray(dv), interpret=True)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf), rtol=1e-5, atol=1e-6)
