"""Conv/BN building blocks (2D and 3D) with PyTorch-equivalent arithmetic.

Layout is channels-last (NHWC / NDHWC) throughout — that is the layout the
TPU MXU consumes without relayout copies. Parity targets are the blocks in
/root/reference/models/module.py:6-93:

 - ConvBnReLU / ConvBn           (2D, bias-free conv + BN(+ReLU))
 - ConvBnReLU3D / ConvBn3D       (3D)
 - ConvTransposeBnReLU3D         (the ConvTranspose3d(k=3, s=2, p=1, op=1)
                                  + BN + ReLU decoder stage of CostRegNet,
                                  /root/reference/models/mvsnet.py:47-60)
 - BasicBlock / Hourglass3d      (defined-but-unused blocks kept for parity,
                                  /root/reference/models/module.py:46-93)

BatchNorm matches torch defaults: eps=1e-5, running-stat momentum 0.1
(flax convention: momentum=0.9), affine, stats over all non-channel axes.

``dtype`` is the computation dtype (bf16 for the TPU fast path); parameters
are always stored in f32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class ConvBnReLU(nn.Module):
    """2D conv (no bias) + BatchNorm + optional ReLU."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.pad
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(s, s),
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


class ConvBnReLU3D(nn.Module):
    """3D conv (no bias) + BatchNorm + optional ReLU. Input [B, D, H, W, C]."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.pad
        x = nn.Conv(
            self.features,
            (k, k, k),
            strides=(s, s, s),
            padding=[(p, p)] * 3,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


class ConvTransposeBnReLU3D(nn.Module):
    """Transposed 3D conv with exactly torch's ConvTranspose3d(kernel=3,
    stride=2, padding=1, output_padding=1) arithmetic, + BN + optional ReLU.

    Implemented as an input-dilated correlation: dilate the input by 2
    (inserting zeros), pad (1, 2) per spatial dim, and convolve with the
    stored kernel. The stored kernel is in correlation DHWIO layout — the
    torch checkpoint importer flips torch's weight spatially and transposes
    (interop/torch_import.py). Output spatial dims are exactly 2x input,
    matching the skip-connection shapes of CostRegNet
    (/root/reference/models/mvsnet.py:64-73).
    """

    features: int
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, in_features, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1, 1),
            padding=[(1, 2), (1, 2), (1, 2)],
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(y)
        return nn.relu(y) if self.relu else y


class BasicBlock(nn.Module):
    """Stride-S residual block (defined in the reference but unused by
    MVSNet; kept for component parity,
    /root/reference/models/module.py:46-62)."""

    features: int
    stride: int
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBnReLU(
            self.features, 3, self.stride, 1, dtype=self.dtype, name="conv1"
        )(x, train)
        out = ConvBnReLU(
            self.features, 3, 1, 1, relu=False, dtype=self.dtype, name="conv2"
        )(out, train)
        if self.downsample:
            x = ConvBnReLU(
                self.features,
                1,
                self.stride,
                0,
                relu=False,
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        return out + x


class Hourglass3d(nn.Module):
    """2-level 3D hourglass with 1x1 redirect convs (defined-but-unused
    parity block, /root/reference/models/module.py:65-93)."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.channels
        conv1 = ConvBnReLU3D(c * 2, 3, 2, 1, dtype=self.dtype, name="conv1a")(x, train)
        conv1 = ConvBnReLU3D(c * 2, 3, 1, 1, dtype=self.dtype, name="conv1b")(conv1, train)
        conv2 = ConvBnReLU3D(c * 4, 3, 2, 1, dtype=self.dtype, name="conv2a")(conv1, train)
        conv2 = ConvBnReLU3D(c * 4, 3, 1, 1, dtype=self.dtype, name="conv2b")(conv2, train)
        dconv2 = ConvTransposeBnReLU3D(c * 2, relu=False, dtype=self.dtype, name="dconv2")(
            conv2, train
        )
        redir2 = ConvBnReLU3D(c * 2, 1, 1, 0, relu=False, dtype=self.dtype, name="redir2")(
            conv1, train
        )
        dconv2 = nn.relu(dconv2 + redir2)
        dconv1 = ConvTransposeBnReLU3D(c, relu=False, dtype=self.dtype, name="dconv1")(
            dconv2, train
        )
        redir1 = ConvBnReLU3D(c, 1, 1, 0, relu=False, dtype=self.dtype, name="redir1")(
            x, train
        )
        return nn.relu(dconv1 + redir1)
