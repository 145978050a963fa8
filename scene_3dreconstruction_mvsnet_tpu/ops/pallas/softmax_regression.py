"""Fused softmax -> depth expectation -> windowed confidence TPU kernel.

Replaces the 4-op XLA tail of MVSNet.forward (softmax over D, expectation,
4-tap window sum, gather-at-index; /root/reference/models/mvsnet.py:192-218)
with a single VMEM-resident pass: the [D, H, W] probability volume never
round-trips to HBM — each (H-tile, W-tile) block streams its D axis through
VMEM once, producing depth and confidence maps directly.

Index gathering is done without a gather: the truncated expected index is
compared against the plane counter to build a window mask, and the 4-tap
window sum is accumulated under it (O(D) VPU work per pixel, no dynamic
addressing).

The kernel STREAMS the D axis with statically-unrolled per-plane (8, TILE_W)
ops instead of materializing [D, TH, TW] values: whole-volume jnp ops on a
192-plane block are 192-vreg values (vs 64 physical vregs), and the
resulting spill traffic made the first version of this kernel ~20x slower
than its compute floor (measured 2.57 ms at D192/216x288 on v5e against a
~0.12 ms HBM floor). A lax.fori_loop variant was no better (2.92 ms — the
per-iteration loop overhead at D x 3 passes x 81 tiles eats the win,
scripts/kexp_vpu_ceiling.py); full static unroll keeps ~8 live vregs and
straight-line code. exp is evaluated once per element (pass B stores
e = exp(x - max) to a VMEM scratch; pass C re-reads it for the
windowed-mass contraction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cost_ref, dv_ref, depth_ref, conf_ref, e_ref):
    """cost_ref: [D, TH, TW] VMEM; dv_ref: [D, 1] SMEM; outs: [TH, TW];
    e_ref: [D, TH, TW] f32 VMEM scratch (unnormalized softmax numerators)."""
    D = cost_ref.shape[0]
    th, tw = depth_ref.shape
    zero = jnp.zeros((th, tw), jnp.float32)

    # pass A: running max over D (softmax stability); 8 parallel chains
    # bound the dependency length at D/8 while keeping only 8 planes live
    # (holding all D planes for a full tree is exactly the vreg spill this
    # rewrite removes)
    lanes = min(8, D)
    accs = [cost_ref[d].astype(jnp.float32) for d in range(lanes)]
    for d in range(lanes, D):
        accs[d % lanes] = jnp.maximum(
            accs[d % lanes], cost_ref[d].astype(jnp.float32)
        )
    while len(accs) > 1:
        accs = [
            jnp.maximum(accs[i], accs[i + 1]) if i + 1 < len(accs) else accs[i]
            for i in range(0, len(accs), 2)
        ]
    m = accs[0]

    # pass B: e = exp(x - m) once per element (stored for pass C), with the
    # running sums the depth expectation and expected index need
    s, dnum, inum = zero, zero, zero
    for d in range(D):
        e = jnp.exp(cost_ref[d].astype(jnp.float32) - m)
        e_ref[d] = e
        s = s + e
        dnum = dnum + e * dv_ref[d, 0]
        inum = inum + e * jnp.float32(d)
    depth_ref[:] = dnum / s

    # truncated expected index -> 4-tap window [idx-1, idx+2] mass
    # (= the original prob[idx-1]+prob[idx]+prob[idx+1]+prob[idx+2] with
    # zero padding: out-of-range planes simply never enter the loop)
    idx = jnp.clip(inum / s, 0.0, D - 1.0).astype(jnp.int32)

    conf = zero
    for d in range(D):
        sel = ((d >= idx - 1) & (d <= idx + 2)).astype(jnp.float32)
        conf = conf + e_ref[d] * sel
    conf_ref[:] = conf / s


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "interpret"))
def fused_softmax_regression(
    cost_reg: jnp.ndarray,
    depth_values: jnp.ndarray,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cost_reg: [B, D, H, W] logits; depth_values: [B, D].

    Returns (depth [B, H, W], confidence [B, H, W]), matching
    ops.regression.regress_depth_and_confidence.
    """
    B, D, H, W = cost_reg.shape

    grid = (pl.cdiv(H, tile_h), pl.cdiv(W, tile_w))

    def one(cost, dv):
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (D, tile_h, tile_w),
                    lambda i, j: (0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (D, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((D, tile_h, tile_w), jnp.float32)],
            interpret=interpret,
        )(cost, dv[:, None])

    depth, conf = jax.vmap(one)(cost_reg, depth_values)
    return depth, jax.lax.stop_gradient(conf)
