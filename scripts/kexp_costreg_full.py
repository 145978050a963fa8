#!/usr/bin/env python
"""Full-module CostRegNet shootout: current flat U-Net vs a plain NDHWC
lax-conv3d U-Net (same param tree), BN/ReLU included, inference and train
modes, bench shape (D=192, 216x288, bf16).

scripts/kexp_costreg_layers.py found bare plain conv3d 2.2x faster than the
flat convs in aggregate (7.4 vs 16.3 ms); this checks whether elementwise
BN/ReLU/skip taxes on the NDHWC layouts (the round-1 motivation for the
flat layout) survive in the full composition.
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

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.rand(1, D0, H0, W0, 32).astype(np.float32), jnp.bfloat16
    )

    flat_model = CostRegNet(dtype=jnp.bfloat16, flat=True)
    variables = flat_model.init(jax.random.PRNGKey(0), x)

    def plain_apply(variables, x, train=False):
        """Same U-Net with plain lax NDHWC conv3d + BN/ReLU; reads the same
        param tree (conv/kernel [3,3,3,I,O] correlation DHWIO, bn/...)."""
        p = variables["params"]
        bs = variables["batch_stats"]

        def conv(name, v, stride=1, transpose=False):
            sub = p[name]
            k = (sub["kernel"] if "kernel" in sub
                 else sub["conv"]["kernel"]).astype(jnp.bfloat16)
            if transpose:
                return jax.lax.conv_general_dilated(
                    v, k, (1, 1, 1), [(1, 2)] * 3,
                    lhs_dilation=(2, 2, 2),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
            return jax.lax.conv_general_dilated(
                v, k, (stride,) * 3, [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def bn_relu(name, v, relu=True):
            b = p[name]["bn"]
            if train:
                mean = jnp.mean(v.astype(jnp.float32), axis=(0, 1, 2, 3))
                var = jnp.var(v.astype(jnp.float32), axis=(0, 1, 2, 3))
            else:
                mean = bs[name]["bn"]["mean"]
                var = bs[name]["bn"]["var"]
            scale = (b["scale"] / jnp.sqrt(var + 1e-5)).astype(jnp.bfloat16)
            bias = (b["bias"] - mean * b["scale"] / jnp.sqrt(var + 1e-5)
                    ).astype(jnp.bfloat16)
            v = v * scale + bias
            return jax.nn.relu(v) if relu else v

        c0 = bn_relu("conv0", conv("conv0", x))
        c1 = bn_relu("conv1", conv("conv1", c0, 2))
        c2 = bn_relu("conv2", conv("conv2", c1))
        c3 = bn_relu("conv3", conv("conv3", c2, 2))
        c4 = bn_relu("conv4", conv("conv4", c3))
        c5 = bn_relu("conv5", conv("conv5", c4, 2))
        v = bn_relu("conv6", conv("conv6", c5))
        v = c4 + bn_relu("conv7", conv("conv7", v, transpose=True))
        v = c2 + bn_relu("conv9", conv("conv9", v, transpose=True))
        v = c0 + bn_relu("conv11", conv("conv11", v, transpose=True))
        k = p["prob"]["kernel"].astype(jnp.bfloat16)
        v = jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + p["prob"]["bias"].astype(jnp.bfloat16)
        return v

    def timeit(fn):
        @jax.jit
        def sustained(variables, x):
            def body(c, _):
                y = fn(variables, x + c)
                return c + y.reshape(-1)[0] * 0, jnp.float32(
                    y.reshape(-1)[0]
                )
            _, outs = jax.lax.scan(
                body, jnp.bfloat16(0.0), None, length=ITERS
            )
            return outs

        float(jnp.sum(sustained(variables, x)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(sustained(variables, x)))
            best = min(best, (time.time() - t0) / ITERS)
        return best * 1e3

    flat_inf = timeit(
        lambda v, xx: flat_model.apply(v, xx, train=False)
    )
    plain_inf = timeit(lambda v, xx: plain_apply(v, xx, train=False))
    print(f"inference: flat {flat_inf:7.2f} ms   plain {plain_inf:7.2f} ms")

    flat_tr = timeit(
        lambda v, xx: flat_model.apply(
            v, xx, train=True, mutable=["batch_stats"]
        )[0]
    )
    plain_tr = timeit(lambda v, xx: plain_apply(v, xx, train=True))
    print(f"train:     flat {flat_tr:7.2f} ms   plain {plain_tr:7.2f} ms")

    # numeric sanity: same params, same math (inference)
    a = flat_model.apply(variables, x, train=False)
    b = plain_apply(variables, x, train=False)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |flat - plain| (inference): {d:.3e}")


if __name__ == "__main__":
    main()
