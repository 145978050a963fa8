"""CostRegNet: 3D U-Net cost-volume regularizer.

Architecture parity with /root/reference/models/mvsnet.py:33-73: encoder
32 -> 8 -> (s2) 16 -> 16 -> (s2) 32 -> 32 -> (s2) 64 -> 64, decoder of three
ConvTranspose3d(+BN+ReLU) stages with additive skip connections, final plain
conv3d to 1 channel (with bias). Input [B, D, H, W, 32] (channels-last cost
volume) -> [B, D, H, W, 1].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnReLU3D, ConvTransposeBnReLU3D, DecomposedConv3d


class CostRegNet(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        conv0 = ConvBnReLU3D(8, dtype=d, name="conv0")(x, train)
        conv1 = ConvBnReLU3D(16, stride=2, dtype=d, name="conv1")(conv0, train)
        conv2 = ConvBnReLU3D(16, dtype=d, name="conv2")(conv1, train)
        conv3 = ConvBnReLU3D(32, stride=2, dtype=d, name="conv3")(conv2, train)
        conv4 = ConvBnReLU3D(32, dtype=d, name="conv4")(conv3, train)
        conv5 = ConvBnReLU3D(64, stride=2, dtype=d, name="conv5")(conv4, train)
        x = ConvBnReLU3D(64, dtype=d, name="conv6")(conv5, train)
        x = conv4 + ConvTransposeBnReLU3D(32, dtype=d, name="conv7")(x, train)
        x = conv2 + ConvTransposeBnReLU3D(16, dtype=d, name="conv9")(x, train)
        x = conv0 + ConvTransposeBnReLU3D(8, dtype=d, name="conv11")(x, train)
        x = DecomposedConv3d(1, stride=1, use_bias=True, dtype=d, name="prob")(x)
        return x
