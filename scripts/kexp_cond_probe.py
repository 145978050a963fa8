"""Probe: does a vector-valued lax.cond inside a Pallas TPU kernel compile on this stack?

Round-4 session 1 observed both plain and scalar-prefetch forms hanging >280 s at
compile while ordinary kernels compiled in <1 s (docs/ROUND4_NOTES.md). This probe
re-checks on the current jax/Mosaic/libtpu stack before investing in the
data-dependent row-skip sweep kernel. Run bounded: `timeout 300 python scripts/kexp_cond_probe.py`.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_cond(n_ref, x_ref, o_ref):
    # n_ref: scalar-prefetch (SMEM) int32 [1]; x: [8, 128] f32
    x = x_ref[...]
    acc = x * 2.0

    def add_pass(a):
        return a + x * 3.0

    n = n_ref[0]
    acc = jax.lax.cond(n > 1, add_pass, lambda a: a, acc)
    o_ref[...] = acc


def _kernel_when_scratch(n_ref, x_ref, o_ref, acc_ref):
    # Fallback form: accumulate through a VMEM scratch so pl.when (no carry) works.
    acc_ref[...] = x_ref[...] * 2.0

    @pl.when(n_ref[0] > 1)
    def _():
        acc_ref[...] = acc_ref[...] + x_ref[...] * 3.0

    o_ref[...] = acc_ref[...]


def main():
    x = jnp.ones((8, 128), jnp.float32)

    for name, build in (
        (
            "when_scratch",
            lambda: pl.pallas_call(
                _kernel_when_scratch,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(1,),
                    in_specs=[pl.BlockSpec((8, 128), lambda i, n: (0, 0))],
                    out_specs=pl.BlockSpec((8, 128), lambda i, n: (0, 0)),
                    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ),
        ),
        (
            "lax_cond",
            lambda: pl.pallas_call(
                _kernel_cond,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(1,),
                    in_specs=[pl.BlockSpec((8, 128), lambda i, n: (0, 0))],
                    out_specs=pl.BlockSpec((8, 128), lambda i, n: (0, 0)),
                ),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ),
        ),
    ):
        fn = build()
        for nval, want in ((jnp.array([1], jnp.int32), 2.0), (jnp.array([2], jnp.int32), 5.0)):
            t0 = time.time()
            out = jax.block_until_ready(fn(nval, x))
            dt = time.time() - t0
            ok = bool(jnp.allclose(out, want))
            print(f"{name} n={int(nval[0])}: {dt:.2f}s ok={ok} (want {want}, got {float(out[0,0])})", flush=True)


if __name__ == "__main__":
    main()
