"""Probe Mosaic lowering of candidate v2-kernel primitives on real TPU.

Each probe is a tiny pallas kernel; we check it (a) compiles, (b) returns
correct values. Timing is not the point here (shapes too small).
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, expect=None):
    try:
        out = jax.jit(fn)(*args)
        out = np.asarray(jax.block_until_ready(out))
        if expect is not None:
            ok = np.allclose(out, expect, atol=1e-5)
            print(f"{name}: COMPILED, correct={ok}")
            if not ok:
                print("   got ", out.ravel()[:8], "\n   want", np.asarray(expect).ravel()[:8])
        else:
            print(f"{name}: COMPILED, out shape {out.shape}")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAILED - {type(e).__name__}: {msg}")


# ---------- probe 1: take_along_axis on (8, 256) f32 (2 lane-halves) ------
def p1_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[:]            # (8, 256)
    idx = idx_ref[:]        # (8, 128) int32 in [0, 256)
    o_ref[:] = jnp.take_along_axis(x, idx, axis=1)[:, :128]


def p1(x, idx):
    return pl.pallas_call(
        p1_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


rng = np.random.RandomState(0)
x = rng.rand(8, 256).astype(np.float32)
idx = rng.randint(0, 256, (8, 256)).astype(np.int32)
expect = np.take_along_axis(x, idx, axis=1)[:, :128]
run("p1 take_along_axis (8,256) f32 cross-half", p1, x, idx, expect=expect)

# ---------- probe 2: take_along_axis within one half (8,128) --------------
def p2_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def p2(x, idx):
    return pl.pallas_call(
        p2_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


x2 = x[:, :128]
idx2 = rng.randint(0, 128, (8, 128)).astype(np.int32)
run("p2 take_along_axis (8,128) f32", p2, x2, idx2,
    expect=np.take_along_axis(x2, idx2, axis=1))

# ---------- probe 3: bf16 take_along_axis (16,128) ------------------------
def p3_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def p3(x, idx):
    return pl.pallas_call(
        p3_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


xb = rng.rand(16, 128).astype(jnp.bfloat16)
idx3 = rng.randint(0, 128, (16, 128)).astype(np.int32)
run("p3 take_along_axis (16,128) bf16", p3, xb, idx3,
    expect=np.take_along_axis(np.asarray(xb, np.float32), idx3, axis=1))

# ---------- probe 4: dynamic roll along lanes ------------------------------
def p4_kernel(x_ref, s_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)


def p4(x, s):
    return pl.pallas_call(
        p4_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)


s = np.array([37], np.int32)
run("p4 pltpu.roll dynamic shift (8,256)", p4, x, s,
    expect=np.roll(x, 37, axis=1))

# ---------- probe 5: bitcast-unpack 2xbf16 from f32 ------------------------
def p5_kernel(x_ref, o0_ref, o1_ref):
    u = pltpu.bitcast(x_ref[:], jnp.uint32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.uint32) << jnp.uint32(16)
    hi = u & jnp.uint32(0xFFFF0000)
    o0_ref[:] = pltpu.bitcast(lo, jnp.float32)
    o1_ref[:] = pltpu.bitcast(hi, jnp.float32)


def p5(x):
    return pl.pallas_call(
        p5_kernel,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )(x)


a = rng.rand(8, 128).astype(jnp.bfloat16)
b = rng.rand(8, 128).astype(jnp.bfloat16)
packed = (
    np.asarray(a).view(np.uint16).astype(np.uint32)
    | (np.asarray(b).view(np.uint16).astype(np.uint32) << 16)
).view(np.float32)


def p5_wrap(x):
    lo, hi = p5(x)
    return jnp.stack([lo, hi])


expect5 = np.stack([np.asarray(a, np.float32), np.asarray(b, np.float32)])
run("p5 unpack 2xbf16 from f32", p5_wrap, packed, expect=expect5)

# ---------- probe 6: dynamic sublane slice (8-aligned) ----------------------
def p6_kernel(x_ref, s_ref, o_ref):
    st = pl.multiple_of(s_ref[0], 8)
    o_ref[:] = x_ref[pl.ds(st, 8), :]


def p6(x, s):
    return pl.pallas_call(
        p6_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)


x6 = rng.rand(64, 128).astype(np.float32)
run("p6 dynamic sublane slice", p6, x6, np.array([16], np.int32),
    expect=x6[16:24])

# ---------- probe 7: unaligned dynamic sublane slice ------------------------
def p7_kernel(x_ref, s_ref, o_ref):
    o_ref[:] = x_ref[pl.ds(s_ref[0], 8), :]


def p7(x, s):
    return pl.pallas_call(
        p7_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)


run("p7 UNaligned dynamic sublane slice", p7, x6, np.array([13], np.int32),
    expect=x6[13:21])
