"""Pallas TPU kernel for the plane-sweep homography warp (EXPERIMENTAL).

Status (round 1): numerically exact vs the XLA sampler on real TPU
(maxdiff ~1e-4 at DTU-full feature shapes) with correct validity gating,
but v1 is not yet faster than XLA's gather (222 vs 139 ms/view at
216x288xD192): the unrolled (YSPAN+1)-row x 3-lane-half inner loop does
~2.4x redundant work. Planned optimizations: depth-group processing over
shared windows (adjacent hypotheses move sub-pixel), bf16 patches (halves
vreg traffic), 2-half windows for translation-dominant rigs, per-rig YSPAN.
Until it wins, the model flag `use_pallas_warp` stays default-off.

Why a kernel: XLA lowers the bilinear warp's random access to a row-gather
that runs at ~13 ns/tap (~150 ms per source view at the DTU-full config).
This kernel exploits the *epipolar locality* of the sweep instead: for a
fixed tile of reference pixels, the samples of ALL depth hypotheses lie on
epipolar segments inside a small source window. So:

  1. per (8-row x 128-col) output tile, one DMA stages a source PATCH
     (all depth planes share it) into VMEM,
  2. per (depth, output row), samples are fetched from a small WINDOW of
     the patch with per-lane `tpu.dynamic_gather` ops along the x axis and
     an unrolled YSPAN loop along y (the per-row y-span of a projective
     warp is tiny for real rigs),
  3. out-of-image taps are zeroed by masks computed from the *original*
     image coordinates, reproducing torch's grid_sample zeros padding and
     the reference's align_corners composition exactly
     (see ops/sampling.py; /root/reference/models/module.py:96-139).

Window/patch origins are precomputed with cheap jnp corner evaluations
(projective coordinates are monotonic along rows and in 1/depth, so extremes
sit at corners). `plan_windows` also returns a validity flag: if a rig's
geometry exceeds the static window envelope (PR/PC/YSPAN/XSPAN), the caller
falls back to the XLA sampler.

The kernel consumes the source features pre-transposed to [H, C, W] so the
channel axis rides sublanes (8 channels per vreg) and the window's x axis
rides lanes, which is what `dynamic_gather` wants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static envelope (f32 patch: PR * C * PC * 4B = 48*32*512*4 = 3.1 MB VMEM)
PR = 48      # patch rows
PC = 512     # patch cols
YSPAN = 4    # rows examined per output row
XSPAN = 384  # cols examined per output row (3 x 128-lane halves; one half is 128-alignment slack)
TILE_H = 8
TILE_W = 128


class WindowPlan(NamedTuple):
    """Precomputed DMA/window origins for one (src, ref, depth_values)."""

    patch_y0: jnp.ndarray  # [nYB, nXB] i32 patch origin rows (clamped)
    patch_x0: jnp.ndarray  # [nYB, nXB] i32 patch origin cols (clamped)
    woff_y: jnp.ndarray    # [D, nYB, TILE_H, nXB] i32 window row offset in patch
    woff_x: jnp.ndarray    # [D, nYB, TILE_H, nXB] i32 window col offset in patch
    valid: jnp.ndarray     # [] bool — geometry fits the static envelope


def _coord_terms(src_proj, ref_proj):
    """rot/trans of the relative projection (f32, exact)."""
    rel = jnp.matmul(
        src_proj, jnp.linalg.inv(ref_proj), precision=lax.Precision.HIGHEST
    )
    return rel[:3, :3], rel[:3, 3]


def _sample_coord(rot, trans, x, y, inv_d, W, H):
    """Effective sample coords (torch align_corners composition) for ref
    pixel (x, y) at inverse depth inv_d. All args broadcastable f32."""
    den = rot[2, 0] * x + rot[2, 1] * y + rot[2, 2] + trans[2] * inv_d
    xs = (rot[0, 0] * x + rot[0, 1] * y + rot[0, 2] + trans[0] * inv_d) / den
    ys = (rot[1, 0] * x + rot[1, 1] * y + rot[1, 2] + trans[1] * inv_d) / den
    # reference normalize (align_corners=True) + torch unnormalize (False):
    # eff = p * dim/(dim-1) - 0.5
    xe = xs * (W / (W - 1.0)) - 0.5
    ye = ys * (H / (H - 1.0)) - 0.5
    return xe, ye


def plan_windows(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    height: int,
    width: int,
) -> WindowPlan:
    """Corner-evaluate the sweep coordinates to place patches and windows.

    Returns clamped patch origins per tile, per-(d, row) window offsets
    inside the patch, and a validity flag (False => envelope exceeded,
    caller must use the XLA path)."""
    H, W = height, width
    nYB = -(-H // TILE_H)
    nXB = -(-W // TILE_W)
    D = depth_values.shape[0]

    rot, trans = _coord_terms(src_proj, ref_proj)
    inv_d = (1.0 / depth_values).astype(jnp.float32)  # [D]

    # corner grid: x block edges [nXB, 2], y rows [H]
    xs_edges = jnp.stack(
        [jnp.arange(nXB) * TILE_W, jnp.minimum((jnp.arange(nXB) + 1) * TILE_W - 1, W - 1)],
        axis=-1,
    ).astype(jnp.float32)  # [nXB, 2]
    ys = jnp.arange(H, dtype=jnp.float32)  # [H]

    # evaluate at [D, H, nXB, 2]
    xe, ye = _sample_coord(
        rot,
        trans,
        xs_edges[None, None],
        ys[None, :, None, None],
        inv_d[:, None, None, None],
        W,
        H,
    )
    # per (d, row, xb): span of sample coords over the row's lanes
    x_lo = jnp.floor(jnp.min(xe, axis=-1)).astype(jnp.int32)  # [D, H, nXB]
    x_hi = jnp.floor(jnp.max(xe, axis=-1)).astype(jnp.int32) + 1
    y_lo = jnp.floor(jnp.min(ye, axis=-1)).astype(jnp.int32)
    y_hi = jnp.floor(jnp.max(ye, axis=-1)).astype(jnp.int32) + 1

    # windows must cover [lo, hi] (+1 for the bilinear +1 tap)
    x_need = x_hi - x_lo + 2
    y_need = y_hi - y_lo + 2

    # per-tile patch origin: min over (d, rows of the band)
    pad_h = nYB * TILE_H - H
    def band_reduce(a, reduce_fn, pad_value):
        a = jnp.pad(a, ((0, 0), (0, pad_h), (0, 0)), constant_values=pad_value)
        a = a.reshape(D, nYB, TILE_H, nXB)
        return reduce_fn(reduce_fn(a, axis=2), axis=0)  # [nYB, nXB]

    big = jnp.iinfo(jnp.int32).max // 4
    patch_y0 = jnp.clip(band_reduce(y_lo, jnp.min, big) - 1, -PR, max(H - 1, 0))
    patch_x0 = jnp.clip(band_reduce(x_lo, jnp.min, big) - 1, -PC, max(W - 1, 0))
    # clamp into DMA-safe range (patch must lie within the source image; the
    # masks still zero out-of-image taps)
    patch_y0 = jnp.clip(patch_y0, 0, max(H - PR, 0))
    # the patch DMA's lane-dim start must be 128-aligned
    patch_x0 = (jnp.clip(patch_x0, 0, max(W - PC, 0)) // 128) * 128

    # per-(d, row) window offsets relative to the tile's patch
    y_lo_p = jnp.pad(y_lo, ((0, 0), (0, pad_h), (0, 0)), mode="edge")
    x_lo_p = jnp.pad(x_lo, ((0, 0), (0, pad_h), (0, 0)), mode="edge")
    y_lo_b = y_lo_p.reshape(D, nYB, TILE_H, nXB)  # [D, nYB, TH, nXB]
    x_lo_b = x_lo_p.reshape(D, nYB, TILE_H, nXB)
    woff_y = jnp.clip(y_lo_b - patch_y0[None, :, None, :] - 1, 0, PR - YSPAN)
    woff_x = jnp.clip(x_lo_b - patch_x0[None, :, None, :] - 1, 0, PC - XSPAN)

    # validity: every (d, row, xb) window fits the envelope. The in-image
    # part of the needed span must fit; fully out-of-image rows are fine
    # (masks zero them) — restrict the check to spans intersecting the image.
    def banded(a, pad_value=0):
        a = jnp.pad(a, ((0, 0), (0, pad_h), (0, 0)), constant_values=pad_value)
        return a.reshape(D, nYB, TILE_H, nXB)

    x_need_p = banded(x_need)
    y_need_p = banded(y_need)
    x_lo_q = banded(x_lo)
    y_lo_q = banded(y_lo)
    intersects = (
        (x_lo_q < W) & (x_lo_q + x_need_p > 0) & (y_lo_q < H) & (y_lo_q + y_need_p > 0)
    )
    fits = (x_need_p <= XSPAN - 128 - 1) & (y_need_p <= YSPAN)
    # patch must also cover the farthest taps of its whole tile
    x_hi_b = banded(x_hi)
    y_hi_b = banded(y_hi)
    covers = (
        (jnp.minimum(x_hi_b + 1, W - 1) < patch_x0[None, :, None, :] + PC)
        & (jnp.minimum(y_hi_b + 1, H - 1) < patch_y0[None, :, None, :] + PR)
        & (jnp.maximum(x_lo_b, 0) >= patch_x0[None, :, None, :])
        & (jnp.maximum(y_lo_b, 0) >= patch_y0[None, :, None, :])
    )
    valid = jnp.all(jnp.where(intersects, fits & covers, True))
    # windows clamped into the patch must still cover their spans
    return WindowPlan(patch_y0, patch_x0, woff_y, woff_x, valid)


def _warp_kernel(
    # prefetch scalars
    rotrow_ref,      # [9] f32 flattened relative rotation
    trans_ref,       # [3] f32
    invd_ref,        # [D] f32
    patch_y0_ref,    # [nYB*nXB] i32
    patch_x0_ref,    # [nYB*nXB] i32
    # array inputs
    src_t_ref,       # [H, C, W] in ANY/HBM
    woff_y_ref,      # [1, 1, TILE_H, nXB] block (whole trailing dims)
    woff_x_ref,      # [1, 1, TILE_H, nXB] block
    # outputs
    out_ref,         # [1, TILE_H, TILE_W, C] block
    # scratch
    patch_ref,       # [PR, C, PC] VMEM
    sem,             # DMA semaphore
    *,
    H: int,
    W: int,
    C: int,
    nXB: int,
):
    # d innermost: each (yb, xb) tile stages its patch once (at d == 0) and
    # sweeps all depth planes against it before moving on
    yb = pl.program_id(0)
    xb = pl.program_id(1)
    d = pl.program_id(2)
    tile = yb * nXB + xb

    py0 = patch_y0_ref[tile]
    # plan_windows aligns patch_x0 to 128; tell Mosaic so the HBM DMA
    # slice on the lane dim is provably tiled
    px0 = pl.multiple_of(patch_x0_ref[tile], 128)

    # stage the tile's patch once (d == 0): src_t[py0:py0+PR, :, px0:px0+PC]
    @pl.when(d == 0)
    def _():
        cp = pltpu.make_async_copy(
            src_t_ref.at[pl.ds(py0, PR), :, pl.ds(px0, PC)],
            patch_ref,
            sem,
        )
        cp.start()
        cp.wait()

    rot = [rotrow_ref[i] for i in range(9)]
    tr = [trans_ref[i] for i in range(3)]
    inv_d = invd_ref[d]

    # sample coordinates for the whole (TILE_H, TILE_W) tile
    y_out = (yb * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
    x_out = (xb * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)

    den = rot[6] * x_out + rot[7] * y_out + rot[8] + tr[2] * inv_d
    xs = (rot[0] * x_out + rot[1] * y_out + rot[2] + tr[0] * inv_d) / den
    ys = (rot[3] * x_out + rot[4] * y_out + rot[5] + tr[1] * inv_d) / den
    xe = xs * (W / (W - 1.0)) - 0.5
    ye = ys * (H / (H - 1.0)) - 0.5

    x0f = jnp.floor(xe)
    y0f = jnp.floor(ye)
    wx = xe - x0f
    wy = ye - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    n_cg = C // 8

    for r in range(TILE_H):
        wy_r = wy[r : r + 1]          # [1, TILE_W]
        wx_r = wx[r : r + 1]
        x0_r = x0[r : r + 1]
        y0_r = y0[r : r + 1]
        woy = woff_y_ref[0, 0, r, xb]  # i32 scalar (SMEM)
        # lane-dim dynamic slices must be 128-aligned: align the window
        # start down; XSPAN covers the alignment slack
        wox = pl.multiple_of((woff_x_ref[0, 0, r, xb] // 128) * 128, 128)

        # local window coords
        xl = x0_r - (px0 + wox)       # [1, TILE_W] in [0, XSPAN-2] when valid
        yl = y0_r - (py0 + woy)

        # original-image in-bounds masks per tap (zeros padding)
        def inb(yy, xx):
            return (
                (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
            ).astype(jnp.float32)

        m00 = inb(y0_r, x0_r)
        m01 = inb(y0_r, x0_r + 1)
        m10 = inb(y0_r + 1, x0_r)
        m11 = inb(y0_r + 1, x0_r + 1)

        for cg in range(n_cg):
            acc = jnp.zeros((8, TILE_W), jnp.float32)
            # window rows: yl in [0, YSPAN-1] covers tap y0; tap y1 = yl+1
            for ry in range(YSPAN + 1):
                row_sel0 = (yl == ry).astype(jnp.float32)        # y0 tap on row ry
                row_sel1 = (yl + 1 == ry).astype(jnp.float32)    # y1 tap on row ry
                # window row [8c, XSPAN]
                win = patch_ref[woy + ry, pl.ds(cg * 8, 8), pl.ds(wox, XSPAN)]
                # per-lane x gather from the XSPAN cols (2 lane-halves)
                def xg(idx):  # idx [1, TILE_W] in [-1, XSPAN]
                    idx_b = jnp.broadcast_to(idx, (8, TILE_W))
                    val = jnp.zeros((8, TILE_W), jnp.float32)
                    for h in range(XSPAN // 128):
                        part = win[:, h * 128 : (h + 1) * 128].astype(jnp.float32)
                        loc = jnp.clip(idx_b - h * 128, 0, 127)
                        g = jnp.take_along_axis(part, loc, axis=1)
                        sel = ((idx_b >= h * 128) & (idx_b < (h + 1) * 128)).astype(jnp.float32)
                        val = val + g * sel
                    return val

                v0 = xg(xl)        # tap x0
                v1 = xg(xl + 1)    # tap x1
                # bilinear accumulate with masks
                c00 = (1.0 - wx_r) * m00 * row_sel0
                c01 = wx_r * m01 * row_sel0
                c10 = (1.0 - wx_r) * m10 * row_sel1
                c11 = wx_r * m11 * row_sel1
                acc = acc + v0 * ((1.0 - wy_r) * c00 + wy_r * c10)
                acc = acc + v1 * ((1.0 - wy_r) * c01 + wy_r * c11)
            # write [8c, TILE_W] -> out[0, r, :, cg*8:(cg+1)*8] (transpose)
            out_ref[0, r, :, pl.ds(cg * 8, 8)] = acc.T.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def warp_src_feature_pallas(
    src_fea: jnp.ndarray,      # [H, W, C]
    src_proj: jnp.ndarray,     # [4, 4]
    ref_proj: jnp.ndarray,     # [4, 4]
    depth_values: jnp.ndarray, # [D]
    height: int | None = None,
    width: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-view plane-sweep warp -> ([D, H, W, C] warped volume, valid).

    ``valid`` is a scalar bool; when False the result is undefined and the
    caller must use the XLA path (ops.sampling.warp_src_feature).
    """
    H, W, C = src_fea.shape
    D = depth_values.shape[0]
    nYB = -(-H // TILE_H)
    nXB = -(-W // TILE_W)

    plan = plan_windows(src_proj, ref_proj, depth_values, H, W)
    rot, trans = _coord_terms(src_proj, ref_proj)

    src_t = jnp.transpose(src_fea, (0, 2, 1))  # [H, C, W]
    # pad so patch DMA slices stay in range for small images
    pad_rows = max(PR - H, 0)
    pad_cols = max(PC - W, 0)
    if pad_rows or pad_cols:
        src_t = jnp.pad(src_t, ((0, pad_rows), (0, 0), (0, pad_cols)))

    grid = (nYB, nXB, D)

    kernel = functools.partial(_warp_kernel, H=H, W=W, C=C, nXB=nXB)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # src_t stays in HBM
                pl.BlockSpec(
                    (1, 1, TILE_H, nXB),
                    lambda yb, xb, d, *refs: (d, yb, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, TILE_H, nXB),
                    lambda yb, xb, d, *refs: (d, yb, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, TILE_H, TILE_W, C),
                lambda yb, xb, d, *refs: (d, yb, xb, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((PR, C, PC), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((D, nYB * TILE_H, nXB * TILE_W, C), src_fea.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.reshape(rot, (9,)).astype(jnp.float32),
        trans.astype(jnp.float32),
        (1.0 / depth_values).astype(jnp.float32),
        plan.patch_y0.reshape(-1),
        plan.patch_x0.reshape(-1),
        src_t.astype(jnp.float32),
        plan.woff_y,
        plan.woff_x,
    )
    return out[:, :H, :W, :], plan.valid
