"""Fused Pallas conv0 (ops/pallas/conv0_fused.py) parity with the flat
XLA path, interpret mode on CPU.

The kernel replaces CostRegNet's conv0 = ConvBnReLU3D(8) on the 32-channel
cost volume (/root/reference/models/mvsnet.py:37) at eval on the bf16 fast
path; these tests pin it against FlatConvBnReLU3D's eval branch (itself
parity-tested against the torch oracle in test_flat_cost_reg.py /
test_model_parity.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.models.cost_reg_net import (
    CostRegNet,
    FusedFlatConv0,
)
from scene_3dreconstruction_mvsnet_tpu.ops.pallas.conv0_fused import (
    conv0_bn_relu_fused,
)


def _rand_bn(rng):
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 8).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 8).astype(np.float32))
    ra_mean = jnp.asarray(rng.uniform(-1, 1, 8).astype(np.float32))
    ra_var = jnp.asarray(rng.uniform(0.2, 2.0, 8).astype(np.float32))
    return scale, bias, ra_mean, ra_var


@pytest.mark.parametrize("B,D,H,W", [(1, 5, 8, 32), (2, 4, 6, 35)])
def test_fused_matches_flat_xla(B, D, H, W):
    """Direct op vs flat_conv3d_k3_decomposed + eval BN/ReLU, bf16.

    W=35 exercises the partial last block (tail columns are compared only
    inside the valid region; both paths leave BN bias in the tail until
    CostRegNet's mask_tail)."""
    from scene_3dreconstruction_mvsnet_tpu.models.blocks import _flat_bn_relu
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        mask_tail, pack_flat, unpack_flat,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, D, H, W, 32).astype(np.float32))
    k = jnp.asarray((rng.rand(3, 3, 3, 32, 8) - 0.5).astype(np.float32))
    scale, bias, ra_mean, ra_var = _rand_bn(rng)

    got = conv0_bn_relu_fused(
        x, k, scale, bias, ra_mean, ra_var, interpret=True
    )
    got = np.asarray(unpack_flat(
        got.reshape(B * D, H, got.shape[-2], 128).astype(jnp.float32), 8, W
    )).reshape(B, D, H, W, 8)

    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        flat_conv3d_k3_decomposed,
    )

    xf, _ = pack_flat(x.reshape(B * D, H, W, 32).astype(jnp.bfloat16))
    xf = mask_tail(xf, 32, W).reshape(B, D, H, -1, 128)
    yf = flat_conv3d_k3_decomposed(xf, k.astype(jnp.bfloat16), 1, W)

    class _Var:
        def __init__(self, v):
            self.value = v

    want = _flat_bn_relu(
        yf, 8, W, False, (scale, bias, _Var(ra_mean), _Var(ra_var)),
        False, True, jnp.bfloat16,
    )
    want = np.asarray(unpack_flat(
        want.reshape(B * D, H, want.shape[-2], 128).astype(jnp.float32),
        8, W,
    )).reshape(B, D, H, W, 8)

    s = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-2 * s)


def test_costregnet_pallas_conv0_matches_flat():
    """Full CostRegNet(flat) with and without the fused conv0, bf16 eval."""
    rng = np.random.RandomState(1)
    # D=8: the minimum for CostRegNet's three stride-2 D-downsamples
    x = jnp.asarray(rng.rand(1, 8, 8, 16, 32).astype(np.float32))
    flat = CostRegNet(flat=True, dtype=jnp.bfloat16)
    fused = CostRegNet(flat=True, dtype=jnp.bfloat16, pallas_conv0=True)
    vs = flat.init(jax.random.PRNGKey(0), x, False)

    # non-trivial running stats so the BN folding is exercised
    bs = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype),
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": bs}

    a = np.asarray(flat.apply(vs, x, False), np.float32)
    b = np.asarray(fused.apply(vs, x, False), np.float32)
    s = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=3e-2 * s)


def test_param_tree_identical():
    x = jnp.zeros((1, 8, 8, 16, 32))
    flat = CostRegNet(flat=True, dtype=jnp.bfloat16)
    fused = CostRegNet(flat=True, dtype=jnp.bfloat16, pallas_conv0=True)
    va = flat.init(jax.random.PRNGKey(0), x, False)
    vb = fused.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape, va, vb))


def test_train_path_unaffected():
    """pallas_conv0=True must not change the training forward (the fused
    module falls back to the XLA flat path when train=True)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 16, 32).astype(np.float32))
    flat = CostRegNet(flat=True, dtype=jnp.bfloat16)
    fused = CostRegNet(flat=True, dtype=jnp.bfloat16, pallas_conv0=True)
    vs = flat.init(jax.random.PRNGKey(0), x, False)
    ya, ma = flat.apply(vs, x, True, mutable=["batch_stats"])
    yb, mb = fused.apply(vs, x, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        ma, mb,
    )


def test_full_mvsnet_pallas_conv0_matches_flat():
    """Full MVSNet bf16 eval forward with pallas_conv0 == the flat path
    (integration: the W0/mask_tail handoff into conv1 and the MVSNet
    wiring gate, /root/reference/models/mvsnet.py:33-73 is the surface)."""
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet

    rng = np.random.RandomState(3)
    B, V, H, W, D = 1, 3, 64, 64, 8
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    projs = np.broadcast_to(np.eye(4, dtype=np.float32), (B, V, 4, 4)).copy()
    projs[:, 1, 0, 3] = -1.0
    projs[:, 2, 0, 3] = 1.0
    projs = jnp.asarray(projs)
    dv = jnp.asarray(np.linspace(40.0, 60.0, D, dtype=np.float32)[None])

    kw = dict(refine=False, dtype=jnp.bfloat16, flat_features=True,
              flat_costreg=True)
    flat = MVSNet(**kw)
    fused = MVSNet(**kw, pallas_conv0=True)
    vs = flat.init(jax.random.PRNGKey(0), imgs, projs, dv)

    a = flat.apply(vs, imgs, projs, dv, train=False)
    b = fused.apply(vs, imgs, projs, dv, train=False)
    da, db = np.asarray(a["depth"], np.float32), np.asarray(b["depth"], np.float32)
    rng_d = 20.0
    assert np.abs(da - db).max() < 2e-2 * rng_d, np.abs(da - db).max()
    ca = np.asarray(a["photometric_confidence"], np.float32)
    cb = np.asarray(b["photometric_confidence"], np.float32)
    np.testing.assert_allclose(cb, ca, atol=5e-2)
