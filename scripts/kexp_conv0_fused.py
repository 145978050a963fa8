#!/usr/bin/env python
"""A/B the fused streaming conv0 kernel (ops/pallas/conv0_fused.py)
against the flat XLA path, standalone and inside CostRegNet, at the
DTU-full cost-volume shape (D192, 216x288, 32ch, bf16).

Run on the TPU host: python scripts/kexp_conv0_fused.py
Methodology matches bench.py: inputs generated ON DEVICE inside jit (a
host-materialized 1.5 GB volume would serialize through the axon tunnel),
sustained timing via lax.scan, best-of-3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, D, H, W = 1, 192, 216, 288


def _timed(fn, *args, iters=5, reps=3):
    # fetch the scalar (float()) rather than block_until_ready: under the
    # axon tunnel block_until_ready does not block (see bench.py notes).
    float(fn(*args, 0))
    best = float("inf")
    for i in range(reps):
        t = time.perf_counter()
        float(fn(*args, i + 1))
        best = min(best, (time.perf_counter() - t) / iters)
    return best * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    from scene_3dreconstruction_mvsnet_tpu.models.cost_reg_net import CostRegNet
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        flat_conv3d_k3_decomposed, mask_tail, pack_flat,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.conv0_fused import (
        conv0_bn_relu_fused,
    )

    rng = np.random.RandomState(0)
    k = jnp.asarray((rng.rand(3, 3, 3, 32, 8) - 0.5).astype(np.float32))
    bn = [jnp.asarray(v) for v in (
        np.ones(8, np.float32), np.zeros(8, np.float32),
        np.zeros(8, np.float32), np.ones(8, np.float32))]

    @jax.jit
    def fused_many(k, s, b, m, v, seed):
        x = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, D, H, W, 32), jnp.bfloat16)

        def body(c, _):
            y = conv0_bn_relu_fused(x + c, k, s, b, m, v)
            return c + y.reshape(-1)[0] * 0, y.reshape(-1)[0]

        return jax.lax.scan(body, jnp.bfloat16(0), None, length=5)[1].sum()

    @jax.jit
    def xla_many(k, seed):
        x = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, D, H, W, 32), jnp.bfloat16)

        def body(c, _):
            xf, _ = pack_flat((x + c).reshape(B * D, H, W, 32))
            xf = mask_tail(xf, 32, W).reshape(B, D, H, -1, 128)
            y = jnp.maximum(flat_conv3d_k3_decomposed(
                xf, k.astype(jnp.bfloat16), 1, W), 0)
            return c + y.reshape(-1)[0] * 0, y.reshape(-1)[0]

        return jax.lax.scan(body, jnp.bfloat16(0), None, length=5)[1].sum()

    print("conv0 fused kernel : %.2f ms" % _timed(fused_many, k, *bn),
          flush=True)
    print("conv0 XLA flat     : %.2f ms" % _timed(xla_many, k), flush=True)

    for name, m in [
        ("costreg flat            ", CostRegNet(flat=True, dtype=jnp.bfloat16)),
        ("costreg flat+pallas_conv0",
         CostRegNet(flat=True, dtype=jnp.bfloat16, pallas_conv0=True)),
    ]:
        vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16, 32)), False)

        @jax.jit
        def many(v, seed, m=m):
            x = jax.random.uniform(
                jax.random.PRNGKey(seed), (B, D, H, W, 32), jnp.bfloat16)

            def body(c, _):
                y = m.apply(v, x + c, False)
                return c + y.reshape(-1)[0] * 0, y.reshape(-1)[0]

            return jax.lax.scan(body, jnp.bfloat16(0), None, length=5)[1].sum()

        print("%s: %.2f ms" % (name, _timed(many, vs)), flush=True)


if __name__ == "__main__":
    main()
