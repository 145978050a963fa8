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

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _conv2d_folded(x: jnp.ndarray, k2d: jnp.ndarray, stride: int,
                   pad: int, lhs_dilation: int = 1) -> jnp.ndarray:
    """2D conv over [B, D, H, W, I] with (B, D) folded into the batch."""
    B, D, H, W, I = x.shape
    y = lax.conv_general_dilated(
        x.reshape(B * D, H, W, I),
        k2d,
        window_strides=(stride, stride),
        padding=[(pad, pad)] * 2 if lhs_dilation == 1 else [(1, 2), (1, 2)],
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(B, D, y.shape[1], y.shape[2], y.shape[3])


def _shift_d(y: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Shift along the D axis with zero fill: +1 means y'[d] = y[d-1]."""
    zero = jnp.zeros_like(y[:, :1])
    if direction > 0:
        return jnp.concatenate([zero, y[:, :-1]], axis=1)
    return jnp.concatenate([y[:, 1:], zero], axis=1)


def conv3d_k3_decomposed(x: jnp.ndarray, kernel: jnp.ndarray, stride: int) -> jnp.ndarray:
    """3x3x3 conv (padding 1) as three shifted 2D convs over the folded
    depth axis — TPU's 2D convolution path is ~4x faster than its NDHWC
    conv3d lowering at MVS cost-volume shapes.

    x: [B, D, H, W, I]; kernel: [3, 3, 3, I, O] (DHWIO); stride applies to
    all three spatial dims (1 or 2; D must be even for stride 2).
    Exactly y[d] = sum_kd k[kd] (*) x[s*d + kd - 1].
    """
    k0, k1, k2 = kernel[0], kernel[1], kernel[2]
    if stride == 1:
        t0 = _conv2d_folded(x, k0, 1, 1)
        t1 = _conv2d_folded(x, k1, 1, 1)
        t2 = _conv2d_folded(x, k2, 1, 1)
        return t1 + _shift_d(t0, +1) + _shift_d(t2, -1)
    x_even = x[:, 0::2]
    x_odd = x[:, 1::2]
    a = _conv2d_folded(x_even, k1, stride, 1)          # k1 (*) x[2d]
    b = _conv2d_folded(x_odd, k0, stride, 1)           # k0 (*) x[2d+1]
    c = _conv2d_folded(x_odd, k2, stride, 1)           # k2 (*) x[2d+1]
    return a + _shift_d(b, +1) + c


def conv3d_transpose_k3s2_decomposed(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) as interleaved 2D transpose
    convs. ``kernel`` is the correlation DHWIO kernel stored by
    ConvTransposeBnReLU3D: with xd = pad(dilate2(x), (1,2)),
    y[j] = sum_t kernel[t] (*) xd[j+t], so
      y[2i]   = K1 (*) x[i]
      y[2i+1] = K0 (*) x[i] + K2 (*) x[i+1].
    Each K[t] application is the (H, W) transpose conv (lhs_dilation 2,
    padding (1,2)). Output: [B, 2D, 2H, 2W, O].
    """
    k0, k1, k2 = kernel[0], kernel[1], kernel[2]
    y_even = _conv2d_folded(x, k1, 1, 0, lhs_dilation=2)
    y_odd = _conv2d_folded(x, k0, 1, 0, lhs_dilation=2) + _shift_d(
        _conv2d_folded(x, k2, 1, 0, lhs_dilation=2), -1
    )
    B, D, H2, W2, O = y_even.shape
    return jnp.stack([y_even, y_odd], axis=2).reshape(B, 2 * D, H2, W2, O)


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


class FlatConvBnReLU(nn.Module):
    """ConvBnReLU computed in the flat block-Toeplitz layout
    (ops/flat_conv.py): activations stay [N, H, nG, 128] so elementwise
    BN/ReLU pay no channel tile-padding tax and the conv runs as dense
    128x128 MXU matmuls. The parameter tree ('conv/kernel',
    'bn/{scale,bias}' + batch_stats 'bn/{mean,var}') is IDENTICAL to
    ConvBnReLU, so checkpoints and the torch importer are unchanged.

    Call with the flat tensor plus its logical geometry; returns the flat
    output (use ops.flat_conv.unpack_flat at stack end).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    relu: bool = True
    dtype: Any = None
    ci: int = 8          # logical input channels (pre-padding)
    ci_pad: int | None = None

    @nn.compact
    def __call__(self, xf, W_valid: int, H_out: int, train: bool = False):
        from ..ops.flat_conv import (
            flat_channel_stats, flat_channel_vec, mask_tail, toeplitz_conv2d,
            toeplitz_weights,
        )

        cp = self.ci_pad or self.ci
        co = self.features
        kernel = _ParamHolder(
            (self.kernel_size, self.kernel_size, self.ci, co), name="conv"
        )()
        dtype = self.dtype or xf.dtype
        wb = toeplitz_weights(
            kernel.astype(jnp.float32), self.stride, self.pad, ci_pad=cp
        )
        yf = toeplitz_conv2d(xf.astype(dtype), wb.astype(dtype),
                             self.stride, self.pad, H_out)

        # BatchNorm with torch semantics (eps 1e-5, running momentum 0.1)
        bn = _FlatBatchNormParams(co, name="bn")
        Wo = (W_valid + 2 * self.pad - self.kernel_size) // self.stride + 1
        return _flat_bn_relu(
            yf, co, Wo, train, bn(), self.is_initializing(), self.relu, dtype
        )


def _flat_bn_relu(yf, co, Wo, train, bn_vars, is_init, relu, dtype):
    """Shared flat-layout BatchNorm(+ReLU): torch eps/momentum, flax-style
    biased running var (see test_train_mode_bn_stats_update). Rank-agnostic
    over [..., nG, 128]. Train-mode batch stats exclude the zeroed tail
    columns: sums over the masked tensor are exact, so the /n_all moments
    rescale to the valid count."""
    import math

    from ..ops.flat_conv import (
        flat_channel_stats, flat_channel_vec, mask_tail,
    )

    scale, bias, ra_mean, ra_var = bn_vars
    if train:
        yf = mask_tail(yf, co, Wo)
        mean_all, var_all = flat_channel_stats(yf, co)
        n_all = math.prod(yf.shape[:-1]) * (128 // co)
        n_valid = math.prod(yf.shape[:-2]) * Wo
        corr = n_all / n_valid
        mean = mean_all * corr
        var = (var_all + mean_all * mean_all) * corr - mean * mean
        if not is_init:
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * var
    else:
        mean, var = ra_mean.value, ra_var.value
    inv = scale * lax.rsqrt(var + 1e-5)
    s_l = flat_channel_vec(inv, co).astype(dtype)
    b_l = flat_channel_vec(bias - mean * inv, co).astype(dtype)
    yf = yf * s_l + b_l
    return nn.relu(yf) if relu else yf


class FlatConvBnReLU3D(nn.Module):
    """ConvBnReLU3D (k=3, pad=1) on a flat volume [B, D, H, nG, 128] — the
    2D-decomposed 3D conv with flat block-Toeplitz 2D convs. Same param
    tree as ConvBnReLU3D's k3 path ('conv/kernel' [3,3,3,I,O] + 'bn/...')."""

    features: int
    stride: int = 1
    relu: bool = True
    dtype: Any = None
    ci: int = 8
    ci_pad: int | None = None

    @nn.compact
    def __call__(self, xf, W_valid: int, train: bool = False):
        from ..ops.flat_conv import flat_conv3d_k3_decomposed

        kernel = _ParamHolder(
            (3, 3, 3, self.ci, self.features), name="conv"
        )()
        dtype = self.dtype or xf.dtype
        yf = flat_conv3d_k3_decomposed(
            xf.astype(dtype), kernel.astype(dtype),
            self.stride, W_valid, ci_pad=self.ci_pad,
        )
        bn = _FlatBatchNormParams(self.features, name="bn")
        Wo = (W_valid + 2 - 3) // self.stride + 1
        return _flat_bn_relu(
            yf, self.features, Wo, train, bn(), self.is_initializing(),
            self.relu, dtype,
        )


class FlatConvTransposeBnReLU3D(nn.Module):
    """ConvTransposeBnReLU3D on a flat volume — flat transpose convs with
    the same correlation-DHWIO 'kernel' param + 'bn/...' tree."""

    features: int
    relu: bool = True
    dtype: Any = None
    ci: int = 8

    @nn.compact
    def __call__(self, xf, W_valid: int, train: bool = False):
        from ..ops.flat_conv import flat_conv3d_transpose_k3s2

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, self.ci, self.features), jnp.float32,
        )
        dtype = self.dtype or xf.dtype
        yf = flat_conv3d_transpose_k3s2(
            xf.astype(dtype), kernel.astype(dtype), W_valid
        )
        bn = _FlatBatchNormParams(self.features, name="bn")
        return _flat_bn_relu(
            yf, self.features, 2 * W_valid, train, bn(),
            self.is_initializing(), self.relu, dtype,
        )


class FlatDecomposedConv3d(nn.Module):
    """DecomposedConv3d (k=3, pad=1, optional bias) on a flat volume; same
    'kernel'/'bias' params."""

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = None
    ci: int = 8

    @nn.compact
    def __call__(self, xf, W_valid: int):
        from ..ops.flat_conv import flat_channel_vec, flat_conv3d_k3_decomposed

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, self.ci, self.features), jnp.float32,
        )
        dtype = self.dtype or xf.dtype
        yf = flat_conv3d_k3_decomposed(
            xf.astype(dtype), kernel.astype(dtype), self.stride, W_valid
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            yf = yf + flat_channel_vec(bias, self.features).astype(dtype)
        return yf


class _ParamHolder(nn.Module):
    """Creates 'kernel' (and optional 'bias') with nn.Conv's initializers
    under a chosen submodule name, so flat paths share trees with nn.Conv."""

    shape: tuple
    with_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape,
                       jnp.float32)
        if self.with_bias:
            b = self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                           jnp.float32)
            return k, b
        return k


class _FlatBatchNormParams(nn.Module):
    """BatchNorm params/stats with flax's names ('scale','bias' params;
    'mean','var' batch_stats) for flat-layout normalization."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (self.features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (self.features,), jnp.float32)
        return scale, bias, ra_mean, ra_var


class DecomposedConv3d(nn.Module):
    """3x3x3 conv (padding 1, optional bias) computed as shifted 2D convs
    (see conv3d_k3_decomposed). Parameter layout matches nn.Conv
    ('kernel' [3,3,3,I,O], optional 'bias'), so checkpoints/importers are
    unchanged."""

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        y = conv3d_k3_decomposed(
            x.astype(dtype), kernel.astype(dtype), self.stride
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(dtype)
        return y


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
        if k == 3 and p == 1:
            # TPU fast path: 2D-decomposed 3D conv (~4x over NDHWC conv3d)
            x = DecomposedConv3d(
                self.features, stride=s, dtype=self.dtype, name="conv"
            )(x)
        else:
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
        y = conv3d_transpose_k3s2_decomposed(
            x.astype(dtype), kernel.astype(dtype)
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
