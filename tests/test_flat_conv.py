"""Flat block-Toeplitz conv vs lax.conv_general_dilated."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax import lax

from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
    flat_channel_stats,
    flat_channel_vec,
    pack_flat,
    toeplitz_conv2d,
    toeplitz_weights,
    unpack_flat,
)


def _ref_conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "H,W,ci,co,k,s,p,ci_pad",
    [
        (16, 40, 3, 8, 3, 1, 1, 8),     # FeatureNet conv0 (3ch padded to 8)
        (16, 40, 8, 8, 3, 1, 1, None),  # conv1
        (16, 40, 8, 16, 5, 2, 2, None),  # conv2
        (16, 36, 16, 16, 3, 1, 1, None),  # conv3/4
        (16, 36, 16, 32, 5, 2, 2, None),  # conv5
        (8, 24, 32, 32, 3, 1, 1, None),  # conv6/feature
        (8, 21, 8, 8, 3, 1, 1, None),   # ragged width (W % P != 0)
        (8, 24, 32, 64, 3, 2, 1, None),  # CostRegNet 32->64 s2
        (8, 24, 64, 64, 3, 1, 1, None),  # CostRegNet 64->64 s1
    ],
)
def test_toeplitz_matches_lax_conv(H, W, ci, co, k, s, p, ci_pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, H, W, ci).astype(np.float32)
    w = rng.randn(k, k, ci, co).astype(np.float32) / k
    want = np.asarray(_ref_conv(jnp.asarray(x), jnp.asarray(w), s, p))
    Ho, Wo = want.shape[1], want.shape[2]

    xf, _ = pack_flat(jnp.asarray(x), ci_pad=ci_pad)
    wb = toeplitz_weights(jnp.asarray(w), s, p, ci_pad=ci_pad)
    yf = toeplitz_conv2d(xf, wb, s, p, Ho)
    got = np.asarray(unpack_flat(yf, co, Wo))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


def test_flat_stack_two_layers():
    """Chaining layers in flat layout == chaining lax convs."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 12, 40, 3).astype(np.float32)
    w0 = rng.randn(3, 3, 3, 8).astype(np.float32) / 3
    w1 = rng.randn(5, 5, 8, 16).astype(np.float32) / 5
    want = np.asarray(
        _ref_conv(_ref_conv(jnp.asarray(x), jnp.asarray(w0), 1, 1),
                  jnp.asarray(w1), 2, 2)
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import mask_tail

    xf, _ = pack_flat(jnp.asarray(x), ci_pad=8)
    y1 = toeplitz_conv2d(xf, toeplitz_weights(jnp.asarray(w0), 1, 1, ci_pad=8), 1, 1, 12)
    y1 = mask_tail(y1, 8, 40)
    y2 = toeplitz_conv2d(y1, toeplitz_weights(jnp.asarray(w1), 2, 2), 2, 2, 6)
    got = np.asarray(unpack_flat(y2, 16, want.shape[2]))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


@pytest.mark.parametrize(
    "H,W,ci,co,k,s,p,up",
    [
        (8, 48, 32, 8, 3, 1, 1, 1),    # CostRegNet conv0 (sb=4)
        (8, 48, 8, 16, 3, 2, 1, 1),    # conv1 (s2)
        (8, 48, 16, 16, 3, 1, 1, 1),   # conv2
        (8, 48, 32, 64, 3, 2, 1, 1),   # conv5 (s2, Co=64)
        (8, 48, 64, 64, 3, 1, 1, 1),   # conv6
        (8, 48, 8, 1, 3, 1, 1, 1),     # prob head (Co=1, sb=8)
        (8, 24, 64, 32, 3, 1, 1, 2),   # transpose conv7 (upsample)
        (8, 24, 16, 8, 3, 1, 1, 2),    # transpose conv11
    ],
)
def test_general_toeplitz_matches_lax_conv(H, W, ci, co, k, s, p, up):
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        flat_conv2d_general, toeplitz_weights_general,
    )

    rng = np.random.RandomState(0)
    x = rng.randn(2, H, W, ci).astype(np.float32)
    w = rng.randn(k, k, ci, co).astype(np.float32) / k
    pad_hw = [(p, p)] * 2 if up == 1 else [(1, 2)] * 2  # transpose conv pads
    want = np.asarray(
        lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), window_strides=(s, s),
            padding=pad_hw, lhs_dilation=(up, up),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    Ho, Wo = want.shape[1], want.shape[2]

    xf, _ = pack_flat(jnp.asarray(x))
    pw = pad_hw[1][0] if up > 1 else p
    wb, sb, pb = toeplitz_weights_general(jnp.asarray(w), s, pw, up=up)
    Po = 128 // co
    nGo = -(-Wo // Po)
    yf = flat_conv2d_general(xf, wb, sb, pb, s, pad_hw[0], nGo, Ho, up=up)
    got = np.asarray(unpack_flat(yf, co, Wo))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


def test_flat_channel_helpers():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 6, 32, 16).astype(np.float32)
    xf, W = pack_flat(jnp.asarray(x))
    v = rng.rand(16).astype(np.float32)
    # scale in flat layout == scale channels-last
    scaled = np.asarray(unpack_flat(xf * flat_channel_vec(jnp.asarray(v), 16), 16, W))
    np.testing.assert_allclose(scaled, x * v, rtol=1e-6)
    mean, var = map(np.asarray, flat_channel_stats(xf, 16))
    np.testing.assert_allclose(mean, x.reshape(-1, 16).mean(0), atol=1e-5)
    np.testing.assert_allclose(var, x.reshape(-1, 16).var(0), atol=1e-5)
