"""FeatureNet: the 8-layer 2D CNN feature extractor.

Architecture parity with /root/reference/models/mvsnet.py:10-30:
3 -> 8 -> 8 -> (s2) 16 -> 16 -> 16 -> (s2) 32 -> 32 -> 32 channels, two
stride-2 5x5 convs giving a x4 spatial downsample; the final layer is a
plain conv with bias (no BN/ReLU). Input [B, H, W, 3] -> [B, H/4, W/4, 32].

``flat=True`` runs the whole stack in the flat block-Toeplitz layout
(ops/flat_conv.py): one pack at entry, dense 128x128 MXU matmuls per conv,
tile-padding-free BN/ReLU, one unpack at exit. Every layer satisfies the
block-invariance condition C_out == stride * C_in (with the 3-channel input
zero-padded to 8), so the block count never changes. The parameter tree is
identical to the flat=False path — checkpoints interchange freely.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnReLU, FlatConvBnReLU, _ParamHolder


class FeatureNet(nn.Module):
    dtype: Any = None
    flat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        if self.flat:
            return self._flat(x, train)
        x = ConvBnReLU(8, 3, 1, 1, dtype=d, name="conv0")(x, train)
        x = ConvBnReLU(8, 3, 1, 1, dtype=d, name="conv1")(x, train)
        x = ConvBnReLU(16, 5, 2, 2, dtype=d, name="conv2")(x, train)
        x = ConvBnReLU(16, 3, 1, 1, dtype=d, name="conv3")(x, train)
        x = ConvBnReLU(16, 3, 1, 1, dtype=d, name="conv4")(x, train)
        x = ConvBnReLU(32, 5, 2, 2, dtype=d, name="conv5")(x, train)
        x = ConvBnReLU(32, 3, 1, 1, dtype=d, name="conv6")(x, train)
        x = nn.Conv(
            32, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
            use_bias=True, dtype=d, name="feature",
        )(x)
        return x

    def _flat(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from ..ops.flat_conv import (
            flat_channel_vec, mask_tail, pack_flat, toeplitz_conv2d,
            toeplitz_weights, unpack_flat,
        )

        d = self.dtype
        N, H, W, _ = x.shape
        dtype = d or x.dtype
        xf, _ = pack_flat(x.astype(dtype), ci_pad=8)
        xf = mask_tail(xf, 8, W)

        Hc, Wc = H, W
        layers = [
            ("conv0", 8, 3, 1, 1, 3, 8),    # name, co, k, s, p, ci, ci_pad
            ("conv1", 8, 3, 1, 1, 8, None),
            ("conv2", 16, 5, 2, 2, 8, None),
            ("conv3", 16, 3, 1, 1, 16, None),
            ("conv4", 16, 3, 1, 1, 16, None),
            ("conv5", 32, 5, 2, 2, 16, None),
            ("conv6", 32, 3, 1, 1, 32, None),
        ]
        for name, co, k, s, p, ci, ci_pad in layers:
            Ho = (Hc + 2 * p - k) // s + 1
            xf = FlatConvBnReLU(
                co, k, s, p, dtype=d, ci=ci, ci_pad=ci_pad, name=name
            )(xf, Wc, Ho, train)
            Wc = (Wc + 2 * p - k) // s + 1
            Hc = Ho
            xf = mask_tail(xf, co, Wc)

        # final plain conv with bias, no BN/ReLU (ref mvsnet.py:29)
        kernel, bias = _ParamHolder((3, 3, 32, 32), with_bias=True,
                                    name="feature")()
        wb = toeplitz_weights(kernel.astype(jnp.float32), 1, 1)
        xf = toeplitz_conv2d(xf, wb.astype(dtype), 1, 1, Hc)
        xf = xf + flat_channel_vec(bias, 32).astype(dtype)
        return unpack_flat(xf, 32, Wc)
