#!/usr/bin/env python
"""Kernel experiment: CostRegNet conv0 (3x3x3, 32->8) layout variants.

conv0 is the single largest slice of the flat CostRegNet (11.5 ms of the
76.8 ms forward, docs/ROUND2_NOTES.md): the dense flat block-Toeplitz
weights inflate FLOPs ~6x when Ci >> Co (input blocks hold 4 px, output
blocks 16 px, so the dense [128,128] blocks are mostly structural zeros).
True cost: 27*32*8 MACs/voxel * 192*216*288 voxels = 82.5 GMAC -> ~0.9 ms
at v5e bf16 peak; HBM floor (read 764 MB bf16 + write 191 MB) ~1.2 ms.

Variants (all bf16, bench shape B=1 D=192 H=216 W=288):
  flat        flat_conv3d_k3_decomposed ci=32 -> co=8 (current production)
  ndhwc_dec   conv3d_k3_decomposed on [B,D,H,W,C] (folded-D 2D convs)
  ndhwc_conv  plain lax 3D conv NDHWC
  chw_einsum  [D,H,C,W] layout (sweep kernel's native output): 27 shifted
              einsums contracting C over sublanes, W in lanes
Timing: ITERS sustained in-jit iterations via lax.scan (axon RTT-free),
same method as bench.py.
"""

import time

import numpy as np

B, D, H, W, CI, CO = 1, 192, 216, 288, 32, 8
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models.blocks import (
        conv3d_k3_decomposed,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        flat_conv3d_k3_decomposed,
        pack_flat,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, D, H, W, CI).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(
        rng.rand(3, 3, 3, CI, CO).astype(np.float32) * 0.1, jnp.bfloat16
    )

    xf, _ = pack_flat(x.reshape(B * D, H, W, CI))
    xf = xf.reshape(B, D, H, -1, 128)
    xc = jnp.transpose(x, (0, 1, 2, 4, 3))  # [B, D, H, C, W]

    def run_flat(xf):
        return flat_conv3d_k3_decomposed(xf, k, 1, W)

    def run_ndhwc_dec(x):
        return conv3d_k3_decomposed(x, k, 1)

    def run_ndhwc_conv(x):
        return jax.lax.conv_general_dilated(
            x.reshape(B, D, H, W, CI),
            k,
            (1, 1, 1),
            [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def run_chw_einsum(xc):
        xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0), (1, 1)))
        y = None
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    sh = jax.lax.dynamic_slice(
                        xp, (0, dz, dy, 0, dx), (B, D, H, CI, W)
                    )
                    t = jnp.einsum(
                        "bdhiw,io->bdhow", sh, k[dz, dy, dx],
                        preferred_element_type=jnp.bfloat16,
                    )
                    y = t if y is None else y + t
        return y

    variants = {
        "flat": (run_flat, xf),
        "ndhwc_dec": (run_ndhwc_dec, x),
        "ndhwc_conv": (run_ndhwc_conv, x),
        "chw_einsum": (run_chw_einsum, xc),
    }

    for name, (fn, inp) in variants.items():
        @jax.jit
        def sustained(inp, fn=fn):
            def body(c, _):
                y = fn(inp + c)
                return c + y.reshape(-1)[0] * 0, y.reshape(-1)[0]
            _, outs = jax.lax.scan(body, inp.dtype.type(0), None, length=ITERS)
            return outs

        try:
            float(jnp.sum(jnp.asarray(sustained(inp), jnp.float32)))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                float(jnp.sum(jnp.asarray(sustained(inp), jnp.float32)))
                best = min(best, (time.time() - t0) / ITERS)
            print(f"{name:12s} {best * 1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
