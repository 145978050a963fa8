"""CostRegNet: 3D U-Net cost-volume regularizer.

Architecture parity with /root/reference/models/mvsnet.py:33-73: encoder
32 -> 8 -> (s2) 16 -> 16 -> (s2) 32 -> 32 -> (s2) 64 -> 64, decoder of three
ConvTranspose3d(+BN+ReLU) stages with additive skip connections, final plain
conv3d to 1 channel (with bias). Input [B, D, H, W, 32] (channels-last cost
volume) -> [B, D, H, W, 1].

``flat=True`` runs the whole U-Net in the flat block-Toeplitz layout
(ops/flat_conv.py): the volume packs once at entry, every conv is a dense
128-channel conv over (H, nG) (D handled by the same shift decomposition),
BN/ReLU/skip-adds act on unpadded lanes, and the 1-channel prob head
unpacks for free (C_out=1 flat IS the pixel layout). Block counts line up
across skips because every stage satisfies C_out*P_out == 128. Same param
tree as flat=False.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    ConvBnReLU3D,
    ConvTransposeBnReLU3D,
    DecomposedConv3d,
    FlatConvBnReLU3D,
    FlatConvTransposeBnReLU3D,
    FlatDecomposedConv3d,
    _FlatBatchNormParams,
    _ParamHolder,
    _flat_bn_relu,
)


class FusedFlatConv0(nn.Module):
    """conv0 (= ConvBnReLU3D(8) on the 32-channel cost volume) through the
    fused Pallas streaming kernel (ops/pallas/conv0_fused.py) at eval, the
    XLA flat path at train/init. Parameter tree identical to
    FlatConvBnReLU3D(8, ci=32): 'conv/kernel' [3,3,3,32,8] + 'bn/...'.

    Takes the UNPACKED volume [B, D, H, W, 32] (the kernel packs its own
    wide layout in one reshape) and returns the standard flat volume
    [B, D, H, nGo, 128] that conv1 (ci=8) consumes.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        kernel = _ParamHolder((3, 3, 3, 32, 8), name="conv")()
        scale, bias, ra_mean, ra_var = _FlatBatchNormParams(8, name="bn")()
        dtype = self.dtype or x.dtype
        B, D, H, W, C = x.shape

        if train or self.is_initializing():
            # differentiable / batch-stats path (also runs at init so the
            # Pallas kernel never executes in interpret mode there)
            from ..ops.flat_conv import (
                flat_conv3d_k3_decomposed, mask_tail, pack_flat,
            )

            xf, _ = pack_flat(x.reshape(B * D, H, W, C).astype(dtype))
            xf = mask_tail(xf, C, W).reshape(B, D, H, -1, 128)
            yf = flat_conv3d_k3_decomposed(xf, kernel.astype(dtype), 1, W)
            return _flat_bn_relu(
                yf, 8, W, train, (scale, bias, ra_mean, ra_var),
                self.is_initializing(), True, dtype,
            )

        from ..ops.pallas.conv0_fused import conv0_bn_relu_fused

        return conv0_bn_relu_fused(
            x, kernel, scale, bias, ra_mean.value, ra_var.value,
            interpret=jax.default_backend() != "tpu",
        )


class CostRegNet(nn.Module):
    dtype: Any = None
    flat: bool = False
    pallas_conv0: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        if self.flat:
            return self._flat(x, train)
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

    def _flat(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from ..ops.flat_conv import mask_tail, pack_flat, unpack_flat

        d = self.dtype
        B, D, H, W, C = x.shape
        dtype = d or x.dtype

        def cbr(name, co, s, ci, inp, Wi):
            Wo = (Wi + 2 - 3) // s + 1
            y = FlatConvBnReLU3D(co, stride=s, dtype=d, ci=ci, name=name)(
                inp, Wi, train
            )
            return mask_tail(y, co, Wo), Wo

        # conv0 (32->8) is the widest-input layer; the fused Pallas kernel
        # streams the cost volume from HBM once (bf16 eval path only — the
        # kernel computes in bf16, so the f32 parity path keeps XLA)
        if self.pallas_conv0 and d == jnp.bfloat16:
            y0 = FusedFlatConv0(dtype=d, name="conv0")(x, train)
            conv0, W0 = mask_tail(y0, 8, W), W
        else:
            xf, _ = pack_flat(x.reshape(B * D, H, W, C).astype(dtype))
            xf = mask_tail(xf, C, W).reshape(B, D, H, xf.shape[-2], 128)
            conv0, W0 = cbr("conv0", 8, 1, 32, xf, W)
        conv1, W1 = cbr("conv1", 16, 2, 8, conv0, W0)
        conv2, W2 = cbr("conv2", 16, 1, 16, conv1, W1)
        conv3, W3 = cbr("conv3", 32, 2, 16, conv2, W2)
        conv4, W4 = cbr("conv4", 32, 1, 32, conv3, W3)
        conv5, W5 = cbr("conv5", 64, 2, 32, conv4, W4)
        xf, W6 = cbr("conv6", 64, 1, 64, conv5, W5)

        def tbr(name, co, ci, inp, Wi):
            y = FlatConvTransposeBnReLU3D(co, dtype=d, ci=ci, name=name)(
                inp, Wi, train
            )
            return mask_tail(y, co, 2 * Wi), 2 * Wi

        up, Wu = tbr("conv7", 32, 64, xf, W6)
        xf = conv4 + up
        up, Wu = tbr("conv9", 16, 32, xf, Wu)
        xf = conv2 + up
        up, Wu = tbr("conv11", 8, 16, xf, Wu)
        xf = conv0 + up

        xf = FlatDecomposedConv3d(1, use_bias=True, dtype=d, ci=8,
                                  name="prob")(xf, Wu)
        # C_out == 1: flat lanes ARE pixels
        nG = xf.shape[-2]
        out = unpack_flat(xf.reshape(B * D, H, nG, 128), 1, Wu)
        return out.reshape(B, D, H, Wu, 1)
