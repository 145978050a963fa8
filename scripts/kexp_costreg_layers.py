#!/usr/bin/env python
"""Per-layer CostRegNet layout shootout: flat block-Toeplitz vs 2D-decomposed
NDHWC vs plain lax NDHWC conv3d, at bench shapes (D=192, 216x288, bf16).

Decides a mixed-layout CostRegNet: docs/ROUND2_NOTES.md measured the flat
U-Net only ~7% faster end-to-end than decomposed NDHWC, with conv0 (32->8)
paying a 6x FLOP inflation in flat form; scripts/kexp_conv0.py found plain
NDHWC conv3d beats BOTH at conv0 (5.2 vs 8.5 ms). This maps every layer.
"""

import time

import numpy as np

D0, H0, W0 = 192, 216, 288
ITERS = 50

# (name, Ci, Co, stride, transpose, (D,H,W) input)
LAYERS = [
    ("conv0", 32, 8, 1, False, (D0, H0, W0)),
    ("conv1", 8, 16, 2, False, (D0, H0, W0)),
    ("conv2", 16, 16, 1, False, (D0 // 2, H0 // 2, W0 // 2)),
    ("conv3", 16, 32, 2, False, (D0 // 2, H0 // 2, W0 // 2)),
    ("conv4", 32, 32, 1, False, (D0 // 4, H0 // 4, W0 // 4)),
    ("conv5", 32, 64, 2, False, (D0 // 4, H0 // 4, W0 // 4)),
    ("conv6", 64, 64, 1, False, (D0 // 8, H0 // 8, W0 // 8)),
    ("conv7", 64, 32, 1, True, (D0 // 8, H0 // 8, W0 // 8)),
    ("conv9", 32, 16, 1, True, (D0 // 4, H0 // 4, W0 // 4)),
    ("conv11", 16, 8, 1, True, (D0 // 2, H0 // 2, W0 // 2)),
    ("prob", 8, 1, 1, False, (D0, H0, W0)),
]


def main():
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models.blocks import (
        conv3d_k3_decomposed,
        conv3d_transpose_k3s2_decomposed,
    )
    from scene_3dreconstruction_mvsnet_tpu.ops.flat_conv import (
        flat_conv3d_k3_decomposed,
        flat_conv3d_transpose_k3s2,
        pack_flat,
    )

    rng = np.random.RandomState(0)

    def timeit(fn, inp):
        @jax.jit
        def sustained(inp):
            def body(c, _):
                y = fn(inp + c)
                return c + y.reshape(-1)[0] * 0, y.reshape(-1)[0]
            _, outs = jax.lax.scan(body, inp.dtype.type(0), None, length=ITERS)
            return outs

        float(jnp.sum(jnp.asarray(sustained(inp), jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(jnp.asarray(sustained(inp), jnp.float32)))
            best = min(best, (time.time() - t0) / ITERS)
        return best * 1e3

    print(f"{'layer':8s} {'flat':>8s} {'dec':>8s} {'conv3d':>8s}")
    totals = {"flat": 0.0, "dec": 0.0, "conv3d": 0.0}
    for name, ci, co, s, transpose, (D, H, W) in LAYERS:
        x = jnp.asarray(
            rng.rand(1, D, H, W, ci).astype(np.float32), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.rand(3, 3, 3, ci, co).astype(np.float32) * 0.1, jnp.bfloat16
        )
        xf, _ = pack_flat(x.reshape(D, H, W, ci))
        xf = xf.reshape(1, D, H, -1, 128)

        if transpose:
            flat = lambda v: flat_conv3d_transpose_k3s2(v, k, W)
            dec = lambda v: conv3d_transpose_k3s2_decomposed(v, k)
            conv = lambda v: jax.lax.conv_general_dilated(
                v, k, (1, 1, 1), [(1, 2)] * 3,
                lhs_dilation=(2, 2, 2),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        else:
            flat = lambda v: flat_conv3d_k3_decomposed(v, k, s, W)
            dec = lambda v: conv3d_k3_decomposed(v, k, s)
            conv = lambda v: jax.lax.conv_general_dilated(
                v, k, (s, s, s), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        row = [f"{name:8s}"]
        for label, fn, inp in (
            ("flat", flat, xf), ("dec", dec, x), ("conv3d", conv, x)
        ):
            try:
                ms = timeit(fn, inp)
                totals[label] += ms
                row.append(f"{ms:8.2f}")
            except Exception as e:  # noqa: BLE001
                row.append(f"  FAIL({type(e).__name__[:12]})")
        print(" ".join(row))
    print(f"{'TOTAL':8s} {totals['flat']:8.2f} {totals['dec']:8.2f} "
          f"{totals['conv3d']:8.2f}")


if __name__ == "__main__":
    main()
