#!/usr/bin/env python
"""Hybrid CostRegNet cuts: first layer(s) as plain NDHWC lax conv3d, then
pack into the flat block-Toeplitz layout for the rest of the U-Net.

Full-plain lost 5x in composition (kexp_costreg_full.py: 120 vs 24.6 ms —
elementwise/layout taxes), but conv0 standalone is 0.81 ms as plain conv3d
vs 5.3 ms flat. These cuts measure whether the win survives one layout
transition (pack_flat on the 8/16-channel output is a reshape; the
question is what layout XLA picks for the conv output feeding it).

Cuts (bench shape D=192 216x288 bf16, inference):
  flat      all-flat baseline (production)
  A         conv0 ndhwc conv3d + BN/ReLU ndhwc -> pack(8) -> flat rest
  B         conv0 ndhwc conv3d -> pack(8) -> BN/ReLU flat -> flat rest
  C         conv0+conv1 ndhwc (BN/ReLU ndhwc) -> pack(16) -> flat rest
"""

import time

import numpy as np

D0, H0, W0 = 192, 216, 288
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models.cost_reg_net import (
        CostRegNet,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        mask_tail,
        pack_flat,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.rand(1, D0, H0, W0, 32).astype(np.float32), jnp.bfloat16
    )

    flat_model = CostRegNet(dtype=jnp.bfloat16, flat=True)
    variables = flat_model.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    bs = variables["batch_stats"]

    def conv3d(name, v, stride=1):
        k = p[name]["conv"]["kernel"].astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            v, k, (stride,) * 3, [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def bn_affine(name):
        b = p[name]["bn"]
        mean, var = bs[name]["bn"]["mean"], bs[name]["bn"]["var"]
        scale = (b["scale"] / jnp.sqrt(var + 1e-5)).astype(jnp.bfloat16)
        bias = (b["bias"] - mean * b["scale"] / jnp.sqrt(var + 1e-5)
                ).astype(jnp.bfloat16)
        return scale, bias

    # run the flat U-Net from conv1 on, given a flat conv0 output.
    # cheap trick: monkey-apply the flat model but substitute conv0's
    # output — instead re-implement the tail by calling the module's
    # internals is invasive; we just measure the whole flat model and the
    # hybrid variants as standalone closures over the SAME params.
    from scene_3dreconstruction_mvsnet_tpu.models.blocks import (
        _flat_bn_relu,  # noqa: F401  (existence check)
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        flat_conv3d_k3_decomposed,
        flat_conv3d_transpose_k3s2,
    )

    def flat_cbr(name, co, s, inp, Wi):
        k = p[name]["conv"]["kernel"].astype(jnp.bfloat16)
        y = flat_conv3d_k3_decomposed(inp, k, s, Wi)
        Wo = (Wi + 2 - 3) // s + 1
        scale, bias = bn_affine(name)
        P = 128 // co
        y = y * jnp.tile(scale, P) + jnp.tile(bias, P)
        y = jax.nn.relu(y)
        return mask_tail(y, co, Wo), Wo

    def flat_tbr(name, co, inp, Wi):
        k = p[name]["kernel"].astype(jnp.bfloat16)
        y = flat_conv3d_transpose_k3s2(inp, k, Wi)
        scale, bias = bn_affine(name)
        P = 128 // co
        y = y * jnp.tile(scale, P) + jnp.tile(bias, P)
        y = jax.nn.relu(y)
        return mask_tail(y, co, 2 * Wi), 2 * Wi

    def tail_from_conv0(c0f, W0v):
        """conv1..prob in flat, from flat conv0 output [B,D,H,nG,128]."""
        conv1, W1 = flat_cbr("conv1", 16, 2, c0f, W0v)
        conv2, W2 = flat_cbr("conv2", 16, 1, conv1, W1)
        conv3, W3 = flat_cbr("conv3", 32, 2, conv2, W2)
        conv4, W4 = flat_cbr("conv4", 32, 1, conv3, W3)
        conv5, W5 = flat_cbr("conv5", 64, 2, conv4, W4)
        xf, W6 = flat_cbr("conv6", 64, 1, conv5, W5)
        up, Wu = flat_tbr("conv7", 32, xf, W6)
        xf = conv4 + up
        up, Wu = flat_tbr("conv9", 16, xf, Wu)
        xf = conv2 + up
        up, Wu = flat_tbr("conv11", 8, xf, Wu)
        xf = c0f + up
        k = p["prob"]["kernel"].astype(jnp.bfloat16)
        y = flat_conv3d_k3_decomposed(xf, k, 1, Wu)
        return y + p["prob"]["bias"].astype(jnp.bfloat16)

    def pack8(y, B, D, H, W):
        yf, _ = pack_flat(y.reshape(B * D, H, W, 8))
        return mask_tail(yf, 8, W).reshape(B, D, H, -1, 128)

    def run_flat(x):
        return flat_model.apply(variables, x, train=False)

    def run_A(x):
        B, D, H, W, _ = x.shape
        y = conv3d("conv0", x)
        s, b = bn_affine("conv0")
        y = jax.nn.relu(y * s + b)
        return tail_from_conv0(pack8(y, B, D, H, W), W)

    def run_B(x):
        B, D, H, W, _ = x.shape
        y = conv3d("conv0", x)
        yf = pack8(y, B, D, H, W)
        s, b = bn_affine("conv0")
        yf = jax.nn.relu(yf * jnp.tile(s, 16) + jnp.tile(b, 16))
        yf = mask_tail(yf, 8, W)
        return tail_from_conv0(yf, W)

    def timeit(fn):
        @jax.jit
        def sustained(x):
            def body(c, _):
                y = fn(x + c)
                return c + y.reshape(-1)[0] * 0, jnp.float32(y.reshape(-1)[0])
            _, outs = jax.lax.scan(
                body, jnp.bfloat16(0.0), None, length=ITERS
            )
            return outs

        float(jnp.sum(sustained(x)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(sustained(x)))
            best = min(best, (time.time() - t0) / ITERS)
        return best * 1e3

    base = run_flat(x)
    for name, fn in (("flat", run_flat), ("A", run_A), ("B", run_B)):
        ms = timeit(fn)
        out = fn(x)
        out = out if out.ndim == 5 and out.shape[-1] == 1 else out
        print(f"{name:6s} {ms:8.2f} ms")

    # numeric check A vs flat (prob output layouts differ: flat model
    # returns [B,D,H,W,1]; tail returns flat [B,D,H,nG,128] with C_out=1
    # lanes==pixels). Compare after reshape.
    a = run_A(x)
    B, D, H, W, _ = x.shape
    a = a.reshape(B, D, H, -1)[..., :W, None]
    d = float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - base.astype(jnp.float32))))
    print(f"max |A - flat|: {d:.3e}")


if __name__ == "__main__":
    main()
