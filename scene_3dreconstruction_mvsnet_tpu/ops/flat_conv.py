"""Small-channel conv stacks in a flat block-Toeplitz layout.

Why: TPU tiles the two minor dims of every array as (8, 128). A feature map
[N, H, W, C] with C = 3..32 therefore pads its channel dim to 128 lanes — a
4-42x memory blow-up that taxes EVERY elementwise op between convs. Measured
at the DTU-full FeatureNet shapes: a bare conv is 3.2 ms but conv+BN+ReLU is
6.2 ms, because the BN/ReLU pass streams the 16x-padded layout
(docs/ROUND2_NOTES.md). The convs themselves also underfill the MXU
(C_out <= 32 of 128 result lanes).

The fix — keep activations in a FLAT layout

    xf[N, H, nG, 128]    where 128 = P * C   (P = 128//C adjacent pixels)

which tiles with zero waste, and lower each conv to 128x128 matmuls over
whole blocks: output block g depends only on input blocks g-1, g, g+1
(for the kernel widths here), so

    y[., g, :] = sum_dy sum_b  x_dy[., g+b, :] @ Wb[dy, b]     (b in -1,0,1)

with Wb[dy, b][(pi*Ci+ci), (po*Co+co)] = w[dy, dx, ci, co] for the in-range
tap dx = pi + b*Pi - s*po + pad, else 0. The matmuls are dense 128x128 — the
MXU runs them at full utilization — and BN/ReLU act on unpadded lanes.

The block count nG is INVARIANT through a layer iff Pi = s * Po, i.e.
C_out = s * C_in — which holds for every FeatureNet layer
(/root/reference/models/mvsnet.py:10-30: 8->8 s1, 8->16 s2, 16->16 s1,
16->32 s2, 32->32 s1) once the 3-channel input is zero-padded to 8.
Measured: FeatureNet 36.6 ms -> see docs/ROUND2_NOTES.md.

Exact up to contraction order (f32 accumulation, like XLA's conv).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

LANES = 128


def pack_flat(x: jnp.ndarray, ci_pad: int | None = None) -> tuple[jnp.ndarray, int]:
    """[N, H, W, C] -> ([N, H, nG, 128], W). Zero-pads channels to
    ``ci_pad`` (a divisor of 128) and W to a whole number of blocks."""
    N, H, W, C = x.shape
    cp = ci_pad or C
    if LANES % cp:
        raise ValueError(f"ci_pad {cp} must divide {LANES}")
    if cp > C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - C)))
    P = LANES // cp
    nG = -(-W // P)
    if nG * P > W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, nG * P - W), (0, 0)))
    return x.reshape(N, H, nG, LANES), W


def unpack_flat(xf: jnp.ndarray, C: int, W: int) -> jnp.ndarray:
    """[N, H, nG, 128] -> [N, H, W, C]."""
    N, H, nG, _ = xf.shape
    P = LANES // C
    return xf.reshape(N, H, nG * P, C)[:, :, :W]


def toeplitz_weights(w: jnp.ndarray, stride: int, pad: int,
                     ci_pad: int | None = None) -> jnp.ndarray:
    """[kh, kw, Ci, Co] -> [kh, 3, 128, 128] block matmul weights (b-major
    order: b = -1, 0, +1). Ci is taken after padding to ``ci_pad``."""
    kh, kw, Ci, Co = w.shape
    cp = ci_pad or Ci
    if cp > Ci:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - Ci), (0, 0)))
        Ci = cp
    Pi, Po = LANES // Ci, LANES // Co
    if Pi != stride * Po:
        raise ValueError(
            f"block invariance needs C_out == stride * C_in_padded "
            f"(Pi={Pi}, Po={Po}, stride={stride})"
        )
    pi = np.arange(Pi)
    po = np.arange(Po)
    out = []
    for b in (-1, 0, 1):
        # dx[pi, po] = pi + b*Pi - s*po + pad
        dx = pi[:, None] + b * Pi - stride * po[None, :] + pad
        valid = (dx >= 0) & (dx < kw)
        dx_c = np.clip(dx, 0, kw - 1)
        wb = w[:, dx_c]                                  # [kh, Pi, Po, Ci, Co]
        wb = jnp.where(jnp.asarray(valid)[None, :, :, None, None], wb, 0)
        wb = jnp.transpose(wb, (0, 1, 3, 2, 4))          # [kh, Pi, Ci, Po, Co]
        out.append(wb.reshape(kh, LANES, LANES))
    return jnp.stack(out, axis=1)                        # [kh, 3, 128, 128]


def toeplitz_conv2d(xf: jnp.ndarray, wb: jnp.ndarray, stride: int,
                    pad: int, H_out: int) -> jnp.ndarray:
    """Flat-layout conv: xf [N, H, nG, 128], wb from toeplitz_weights
    -> [N, H_out, nG, 128].

    The block recurrence y[., g] = sum_dy sum_b x[., g+b] @ Wb[dy, b] IS a
    2D convolution over (H, nG) with the [kh, 3, 128, 128] HWIO kernel
    ``wb`` — 128 input and output channels, so XLA's conv path runs it at
    full MXU utilization with no tile padding and no materialized shifted
    operands (a hand-rolled dot_general-per-(dy, b) version materialized 9
    shifted copies of the activation per layer and lost 2x)."""
    return lax.conv_general_dilated(
        xf, wb.astype(xf.dtype),
        window_strides=(stride, 1),
        padding=[(pad, pad), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def toeplitz_weights_general(w: jnp.ndarray, stride: int, pad: int,
                             up: int = 1, ci_pad: int | None = None):
    """General banded block weights: supports any block-stride (C_out !=
    stride * C_in) and input dilation ``up`` (transposed convs).

    w: [kh, kw, Ci, Co]. Returns (wb [kh, kb, 128, 128], sb, pb) for
    lax.conv over (H, nG) with window_strides (stride_h, sb) and block
    padding (pb, right-computed by the caller). Entry semantics: output
    pixel po of block g sums w[., dx] * x[(g*Po*stride + po*stride - pad
    + dx) / up] for in-range, up-divisible taps — the dilated-input
    correlation that lax.conv_general_dilated(lhs_dilation=up) computes.
    """
    kh, kw, Ci, Co = w.shape
    cp = ci_pad or Ci
    if cp > Ci:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - Ci), (0, 0)))
        Ci = cp
    Pi, Po = LANES // Ci, LANES // Co
    if (Po * stride) % (Pi * up):
        raise ValueError(
            f"block invariance needs Pi*up | Po*stride (Pi={Pi}, Po={Po}, "
            f"stride={stride}, up={up})"
        )
    sb = (Po * stride) // (Pi * up)

    entries = []  # (bo, pi, dx, po)
    bo_min, bo_max = 0, 0
    for po in range(Po):
        for dx in range(kw):
            i_up = po * stride - pad + dx
            if i_up % up:
                continue
            i_rel = i_up // up
            bo = i_rel // Pi
            pi = i_rel - bo * Pi
            entries.append((bo, pi, dx, po))
            bo_min = min(bo_min, bo)
            bo_max = max(bo_max, bo)
    pb = -bo_min
    kb = bo_max + pb + 1

    # constant routing tensor (built at trace time) + one einsum, instead
    # of per-entry scatters that would bloat the traced graph
    T = np.zeros((kb, Pi, Po, kw), w.dtype if w.dtype != jnp.bfloat16 else np.float32)
    for bo, pi, dx, po in entries:
        T[bo + pb, pi, po, dx] = 1.0
    wb = jnp.einsum(
        "bipd,hdco->hbicpo", jnp.asarray(T), w,
        precision=lax.Precision.HIGHEST,
    )  # [kh, kb, Pi, Ci, Po, Co]
    return wb.reshape(kh, kb, LANES, LANES), sb, pb


def flat_conv2d_general(xf: jnp.ndarray, wb: jnp.ndarray, sb: int, pb: int,
                        stride_h: int, pad_h, nGo: int, H_out: int,
                        up: int = 1) -> jnp.ndarray:
    """Apply general banded weights over (H, nG). ``pad_h`` is (lo, hi) or
    int; ``up`` dilates H (transpose convs dilate H natively here, W via
    the banded build). Output [N, H_out, nGo, 128]."""
    kh, kb = wb.shape[0], wb.shape[1]
    N, H, nG, _ = xf.shape
    if isinstance(pad_h, int):
        pad_h = (pad_h, pad_h)
    # right block padding so exactly nGo output blocks are produced
    pr = (nGo - 1) * sb + kb - nG - pb
    out = lax.conv_general_dilated(
        xf, wb.astype(xf.dtype),
        window_strides=(stride_h, sb),
        padding=[pad_h, (pb, max(pr, 0))],
        lhs_dilation=(up, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert out.shape[1] == H_out and out.shape[2] >= nGo, (out.shape, H_out, nGo)
    return out[:, :, :nGo]


def mask_tail(xf: jnp.ndarray, C: int, W_valid: int) -> jnp.ndarray:
    """Zero the columns past ``W_valid`` in the last block (axis -2). Needed
    between chained flat convs when W doesn't fill a whole number of blocks
    — otherwise boundary garbage from the padded tail feeds the next
    layer. Rank-agnostic: [..., nG, 128]."""
    nG = xf.shape[-2]
    P = LANES // C
    tail_px = W_valid - (nG - 1) * P
    if tail_px >= P:
        return xf
    lane_px = np.arange(LANES) // C
    mask = jnp.asarray(lane_px < tail_px, xf.dtype)
    return jnp.concatenate(
        [xf[..., :-1, :], xf[..., -1:, :] * mask], axis=-2
    )


def _flat2d_folded(xf, wb, sb, pb, stride_h, pad_h, nGo, H_out, up=1):
    """flat_conv2d_general over [B, D, H, nG, 128] with (B, D) folded."""
    B, D, H, nG, L = xf.shape
    y = flat_conv2d_general(
        xf.reshape(B * D, H, nG, L), wb, sb, pb, stride_h, pad_h, nGo,
        H_out, up,
    )
    return y.reshape(B, D, H_out, nGo, L)


def _shift_d(y, direction):
    zero = jnp.zeros_like(y[:, :1])
    if direction > 0:
        return jnp.concatenate([zero, y[:, :-1]], axis=1)
    return jnp.concatenate([y[:, 1:], zero], axis=1)


def flat_conv3d_k3_decomposed(xf: jnp.ndarray, kernel: jnp.ndarray,
                              stride: int, W_valid: int,
                              ci_pad: int | None = None) -> jnp.ndarray:
    """3x3x3 conv (padding 1) on a flat volume [B, D, H, nG, 128] — the
    D-decomposed scheme of models/blocks.py::conv3d_k3_decomposed with the
    2D convs in flat block-Toeplitz form. kernel: [3, 3, 3, I, O] DHWIO."""
    O = kernel.shape[4]
    B, D, H, nG, _ = xf.shape
    Ho = (H + 2 - 3) // stride + 1
    Wo = (W_valid + 2 - 3) // stride + 1
    nGo = -(-Wo // (LANES // O))
    wbs = [
        toeplitz_weights_general(kernel[kd], stride, 1, ci_pad=ci_pad)
        for kd in range(3)
    ]

    def c2d(x5, kd):
        wb, sb, pb = wbs[kd]
        return _flat2d_folded(x5, wb.astype(x5.dtype), sb, pb, stride, 1,
                              nGo, Ho)

    if stride == 1:
        t0, t1, t2 = c2d(xf, 0), c2d(xf, 1), c2d(xf, 2)
        return t1 + _shift_d(t0, +1) + _shift_d(t2, -1)
    x_even = xf[:, 0::2]
    x_odd = xf[:, 1::2]
    a = c2d(x_even, 1)
    b = c2d(x_odd, 0)
    c = c2d(x_odd, 2)
    return a + _shift_d(b, +1) + c


def flat_conv3d_transpose_k3s2(xf: jnp.ndarray, kernel: jnp.ndarray,
                               W_valid: int) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) on a flat volume — the scheme of
    models/blocks.py::conv3d_transpose_k3s2_decomposed with flat 2D
    transpose convs (input dilation 2 folded into the banded weights on W,
    native lhs_dilation on H). Output [B, 2D, 2H, nGo, 128]."""
    O = kernel.shape[4]
    B, D, H, nG, _ = xf.shape
    H2, Wo = 2 * H, 2 * W_valid
    nGo = -(-Wo // (LANES // O))
    wbs = [
        toeplitz_weights_general(kernel[kd], 1, 1, up=2) for kd in range(3)
    ]

    def t2d(x5, kd):
        wb, sb, pb = wbs[kd]
        return _flat2d_folded(x5, wb.astype(x5.dtype), sb, pb, 1, (1, 2),
                              nGo, H2, up=2)

    y_even = t2d(xf, 1)
    y_odd = t2d(xf, 0) + _shift_d(t2d(xf, 2), -1)
    out = jnp.stack([y_even, y_odd], axis=2)
    return out.reshape(B, 2 * D, H2, nGo, LANES)


def flat_channel_vec(v: jnp.ndarray, C: int) -> jnp.ndarray:
    """Per-channel [C] vector -> [128] flat-lane vector (tiled P times)."""
    return jnp.tile(v, LANES // C)


def flat_channel_stats(xf: jnp.ndarray, C: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel mean and variance over all non-channel axes of a flat
    tensor [..., nG, 128] — the lane->channel reduction runs as a
    [*, 128] @ [128, C] one-hot matmul so no padded intermediate is
    formed. Returns (mean[C], var[C])."""
    P = LANES // C
    onehot = jnp.zeros((LANES, C), jnp.float32).at[
        jnp.arange(LANES), jnp.tile(jnp.arange(C), P)
    ].set(1.0)
    flat = xf.reshape(-1, LANES).astype(jnp.float32)
    n = flat.shape[0] * P
    s1 = jnp.matmul(flat.sum(axis=0, keepdims=True), onehot)[0]
    s2 = jnp.matmul((flat * flat).sum(axis=0, keepdims=True), onehot)[0]
    mean = s1 / n
    var = s2 / n - mean * mean
    return mean, var
