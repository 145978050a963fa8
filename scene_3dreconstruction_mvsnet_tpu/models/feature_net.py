"""FeatureNet: the 8-layer 2D CNN feature extractor.

Architecture parity with /root/reference/models/mvsnet.py:10-30:
3 -> 8 -> 8 -> (s2) 16 -> 16 -> 16 -> (s2) 32 -> 32 -> 32 channels, two
stride-2 5x5 convs giving a x4 spatial downsample; the final layer is a
plain conv with bias (no BN/ReLU). Input [B, H, W, 3] -> [B, H/4, W/4, 32].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnReLU


class FeatureNet(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
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
