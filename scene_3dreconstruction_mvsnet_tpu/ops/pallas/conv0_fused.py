"""Fused CostRegNet conv0 (3x3x3, 32->8, stride 1) + BatchNorm + ReLU
TPU kernel on the flat block-Toeplitz layout.

Why a dedicated kernel: conv0 is the largest single slice of the flat
CostRegNet (the reference op is /root/reference/models/mvsnet.py:37 — the
first 3D conv of the cost-volume regularizer). In the flat layout
(ops/flat_conv.py) the XLA lowering runs THREE separate 2D convs (one per
D-tap of the decomposed 3x3x3 kernel), each streaming the full 32-channel
cost volume from HBM, then two shifted adds and a BN/ReLU pass — ~5 full
HBM sweeps of a ~760 MB (bf16, DTU-full) input. Measured: 11.5 ms of the
76.8 ms round-2 forward; the XLA layout escape routes are dead ends
(scripts/kexp_costreg_hybrid.py: NDHWC conv0 wins standalone but loses
2.5x end-to-end to the pack transition).

This kernel streams the volume ONCE: grid over (B, D+1) with the input
depth-slice d in VMEM, it computes all three D-taps of x[d] and routes
them with two carry buffers (classic streaming stencil):

    out[d-1] = carryA + conv2d(x[d], w[2])      (emitted at step d)
    carryA  <- carryB + conv2d(x[d], w[1])
    carryB  <-          conv2d(x[d], w[0])

so each output slice is complete one step after its last input arrives;
step D (no input) flushes out[D-1] = carryA. BN (eval-mode running stats,
folded to per-lane scale/bias) and ReLU apply at emission — the conv
result never round-trips to HBM.

Layout contract (see ops/flat_conv.py for the flat layout):
  input  xw [B*D, H*nGo, 512]  "wide" packing: 512 lanes = 4 adjacent
         input blocks of (4 px x 32 ch). Produced for free by
         pack_flat_wide (same single XLA reshape family as pack_flat).
  output y  [B*D, H, nGo, 128]  standard flat blocks of (16 px x 8 ch),
         exactly what conv1 (ci=8) consumes.

The 2D conv over (H, W-blocks) is the banded block-Toeplitz matmul of
ops/flat_conv.py::toeplitz_weights_general specialized to Ci=32, Co=8,
s=1: output block go reads input blocks 4*go-1 .. 4*go+4 (6 bands). Band
b's input is a 128-lane slice of the wide row (free) — only the two edge
bands (which reach into the previous/next 4-block group) need a one-row
sublane shift plus a W-edge mask. Each (d-tap, h-tap, band) is then one
dense [H*nGo, 128] x [128, 128] MXU matmul on fully-packed tiles, with
the h-tap handled on the RESULT side (slice-adds at row offsets of
nGo) so no shifted input copies are materialized.

FLOP note: the dense 6-band form inflates MACs ~8x over the true
27*32*8/voxel (the band matrices are ~12% dense) — that is the price of
full (8,128) tiling, shared with the XLA flat path. The win here is
HBM traffic (1 read + 1 write vs ~5 sweeps) and the fused BN/ReLU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CI, CO = 32, 8
PI, PO = LANES // CI, LANES // CO  # 4 px per input block, 16 per output


def pack_flat_wide(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 32] -> [N, H*nGo, 512] wide flat packing.

    nGo = ceil(W/16); W zero-pads to 16*nGo. One reshape away from
    pack_flat's [N, H, 4*nGo, 128] (the 512 lanes are 4 adjacent input
    blocks), emitted directly so XLA lays it out once.
    """
    N, H, W, C = x.shape
    if C != CI:
        raise ValueError(f"pack_flat_wide wants {CI} channels, got {C}")
    nGo = -(-W // PO)
    if nGo * PO > W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, nGo * PO - W), (0, 0)))
    return x.reshape(N, H * nGo, 4 * LANES)


def conv0_band_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 3, 32, 8] DHWIO kernel -> [3, 3, 6, 128, 128] banded block
    weights: WB[kd, dh, bo][pi*32+ci, po*8+co] = w[kd, dh, dx, ci, co]
    with dx = 4*(bo-1) + pi - po + 1 where 0 <= dx < 3 (else zero).

    Derivation: output pixel po of block go reads input pixel
    p = 16*go + po - 1 + dx; band bo holds input block 4*go + bo - 1,
    whose pixel pi is p = 16*go + 4*(bo-1) + pi.
    """
    if w.shape != (3, 3, 3, CI, CO):
        raise ValueError(f"bad conv0 kernel shape {w.shape}")
    T = np.zeros((6, PI, PO, 3), np.float32)
    for bo in range(6):
        for pi in range(PI):
            for po in range(PO):
                dx = 4 * (bo - 1) + pi - po + 1
                if 0 <= dx < 3:
                    T[bo, pi, po, dx] = 1.0
    wb = jnp.einsum(
        "bipd,khdco->khbicpo",
        jnp.asarray(T),
        w.astype(jnp.float32),
    )  # [3, 3, 6, PI, CI, PO, CO]
    return wb.reshape(3, 3, 6, LANES, LANES)


def _kernel(x_ref, wb_ref, sb_ref, out_ref, acc_a, acc_b, *, D, H, nGo,
            relu):
    s = pl.program_id(1)
    R = H * nGo

    # W-edge masks for the two boundary bands: a one-row sublane shift of
    # the flattened [H*nGo] row axis crosses H rows, so the first/last
    # block of each image row must drop the wrapped contribution.
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    def emit(y32):
        sb = sb_ref[...]  # [2, 128] f32: folded BN scale / bias
        y = y32.astype(jnp.bfloat16) * sb[0].astype(jnp.bfloat16) + sb[
            1
        ].astype(jnp.bfloat16)
        if relu:
            y = jnp.maximum(y, jnp.zeros_like(y))
        out_ref[0] = y.reshape(H, nGo, LANES).astype(out_ref.dtype)

    @pl.when(s < D)
    def _compute():
        xw = x_ref[0]  # [R, 512] bf16
        bases = []
        for bo in range(6):
            q, j = divmod(bo - 1, 4)
            b = xw[:, j * LANES:(j + 1) * LANES]
            if q == -1:
                b = jnp.concatenate(
                    [jnp.zeros_like(b[:1]), b[:-1]], axis=0
                ) * (row % nGo != 0).astype(b.dtype)
            elif q == 1:
                b = jnp.concatenate(
                    [b[1:], jnp.zeros_like(b[:1])], axis=0
                ) * (row % nGo != nGo - 1).astype(b.dtype)
            bases.append(b)

        def conv2d(kd):
            t = jnp.zeros((R, LANES), jnp.float32)
            for dh in range(3):
                r = None
                for bo in range(6):
                    d = jax.lax.dot(
                        bases[bo],
                        wb_ref[kd, dh, bo].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                    r = d if r is None else r + d
                # out row h accumulates r at image row h + dh - 1, i.e.
                # flattened offset nGo*(dh-1); array-edge rows get zero
                # contribution (the conv's H zero padding). Shift via
                # concatenate-with-zeros: .at[].add is a scatter-add,
                # which Mosaic cannot lower.
                z = jnp.zeros((nGo, LANES), jnp.float32)
                if dh == 0:
                    t = t + jnp.concatenate([z, r[:-nGo]], axis=0)
                elif dh == 1:
                    t = t + r
                else:
                    t = t + jnp.concatenate([r[nGo:], z], axis=0)
            return t

        t2 = conv2d(2)

        @pl.when(s >= 1)
        def _emit_prev():
            emit(acc_a[...].astype(jnp.float32) + t2)

        t1 = conv2d(1)
        # acc_b is uninitialized scratch at s == 0: select (not multiply —
        # NaN * 0 = NaN) the zero contribution for the first slice.
        prev_b = jnp.where(
            s > 0, acc_b[...].astype(jnp.float32), jnp.float32(0)
        )
        acc_a[...] = (prev_b + t1).astype(acc_a.dtype)
        acc_b[...] = conv2d(0).astype(acc_b.dtype)

    @pl.when(s == D)
    def _flush_last():
        emit(acc_a[...].astype(jnp.float32))


@functools.partial(
    jax.jit, static_argnames=("B", "H", "nGo", "relu", "interpret")
)
def _conv0_call(xw, wb, scale_bias, B, H, nGo, relu, interpret):
    BD = xw.shape[0]
    D = BD // B
    R = H * nGo

    kern = functools.partial(
        _kernel, D=D, H=H, nGo=nGo, relu=relu
    )
    return pl.pallas_call(
        kern,
        grid=(B, D + 1),
        in_specs=[
            pl.BlockSpec(
                (1, R, 4 * LANES),
                lambda b, s: (b * D + jnp.minimum(s, D - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, 6, LANES, LANES),
                lambda b, s: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, LANES), lambda b, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, H, nGo, LANES),
            lambda b, s: (b * D + jnp.maximum(s - 1, 0), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((BD, H, nGo, LANES), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.bfloat16),
            pltpu.VMEM((R, LANES), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(xw, wb, scale_bias)


def conv0_bn_relu_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    ra_mean: jnp.ndarray,
    ra_var: jnp.ndarray,
    *,
    relu: bool = True,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval-mode conv0 + BN + ReLU.

    x: [B, D, H, W, 32] cost volume (any float dtype; computed in bf16).
    kernel: [3, 3, 3, 32, 8] DHWIO. scale/bias/ra_mean/ra_var: [8] BN
    params + running stats (eval-mode folding, matching
    models/blocks.py::_flat_bn_relu's inference branch).

    Returns the standard flat volume [B, D, H, nGo, 128] (16 px x 8 ch
    blocks), ready for the flat conv1 — identical (up to bf16 rounding)
    to FlatConvBnReLU3D(8, ci=32)(pack_flat(x), W, train=False).
    """
    B, D, H, W, C = x.shape
    nGo = -(-W // PO)

    xw = pack_flat_wide(
        x.reshape(B * D, H, W, C).astype(jnp.bfloat16)
    )
    wb = conv0_band_weights(kernel).astype(jnp.bfloat16)

    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(
        ra_var.astype(jnp.float32) + eps
    )
    s_l = jnp.tile(inv, PO)
    b_l = jnp.tile(
        bias.astype(jnp.float32) - ra_mean.astype(jnp.float32) * inv, PO
    )
    scale_bias = jnp.stack([s_l, b_l]).astype(jnp.float32)

    y = _conv0_call(xw, wb, scale_bias, B, H, nGo, relu, interpret)
    return y.reshape(B, D, H, nGo, LANES)
