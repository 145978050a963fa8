"""RefineNet: residual depth refinement head.

The reference ships this module broken — ``F.cat`` does not exist and the
call site passes a single concatenated tensor to a two-argument forward
(/root/reference/models/mvsnet.py:76-88, :238), so ``--refine`` crashes and
every shipped config runs refine=False. Here it is implemented *working*
(per SURVEY.md §7's decision log): the reference image is bilinearly resized
to the depth resolution, concatenated with the depth map (4 channels), passed
through 3x ConvBnReLU(32) + ConvBnReLU(->1), and added as a residual.
Default remains off.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnReLU


class RefineNet(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(
        self, img: jnp.ndarray, depth_init: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """img: [B, H, W, 3] full-res reference image; depth_init: [B, h, w]
        depth at feature resolution -> refined depth [B, h, w]."""
        B, h, w = depth_init.shape
        img_small = jax.image.resize(img, (B, h, w, img.shape[-1]), method="bilinear")
        x = jnp.concatenate([img_small, depth_init[..., None]], axis=-1)
        d = self.dtype
        x = ConvBnReLU(32, dtype=d, name="conv1")(x, train)
        x = ConvBnReLU(32, dtype=d, name="conv2")(x, train)
        x = ConvBnReLU(32, dtype=d, name="conv3")(x, train)
        residual = ConvBnReLU(1, dtype=d, name="res")(x, train)
        return depth_init + residual[..., 0]
