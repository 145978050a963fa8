"""Pallas TPU kernel for the plane-sweep warp BACKWARD pass, and the
custom-VJP warp built on it.

The warp forward is a bilinear gather (ops/sampling.py). Its transpose is a
4-tap scatter-add, which XLA lowers catastrophically on TPU (the round-1
train step spent ~25 s of 32 s there, docs/ROUND1_NOTES.md). This kernel
reformulates the transpose as ANOTHER GATHER, over the inverse homography:

    dsrc[p, q, c] = sum_d sum_{(y,x)} tent(q - xe_d(x,y)) * tent(p - ye_d(x,y))
                    * g[d, y, x, c]

For a source pixel (q, p) at depth d, the contributing reference pixels
(y, x) lie in a small static box around the INVERSE-mapped point
G_d^{-1} (q, p): xe_d is monotonic along rows, so |xe - q| < 1 selects a
contiguous x-range of width ~2/slope, and similarly in y. The kernel walks
that KX x KY candidate box, evaluates the FORWARD map at each candidate
with the exact f32 formulas of the forward kernel (so weights are the
bit-identical tent weights the forward used), and gathers + accumulates.

Structure mirrors ops/pallas/sweep_variance.py: pair-parity split of g
(even/odd ref columns) so each candidate needs one vreg-local gather,
dynamic lane roll to window the gathers, grid (src_tile_y, src_tile_x, d)
with d innermost so dsrc accumulates in the VMEM output block across all
depth planes, and per-(tile, d) double-buffered window DMAs of g[d].

Gradients flow to the sampled feature values only — the sweep coordinates
are treated as constants, matching the reference's no_grad grid
(/root/reference/models/module.py:106-133) and the XLA path's behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128

# default static envelope; override per rig via suggest_grad_envelope()
KX = 4        # candidate box width (x, ref pixels)
YSPAN_G = 6   # window rows per output row (covers KY box + per-row y drift)
PRG = 16      # patch rows DMA'd per (tile, d)
PCPG = 256    # patch cols in PAIR space (= 512 ref px)


class GradPlan(NamedTuple):
    patch_y0: jnp.ndarray   # [D, nYB*nXB] i32
    patch_x0p: jnp.ndarray  # [D, nYB*nXB] i32 (128-aligned, pair space)
    woy: jnp.ndarray        # [D, nYB, TILE_H, nXB] i32
    base: jnp.ndarray       # [D, nYB, TILE_H, nXB] i32 (pair space)
    inv_g: jnp.ndarray      # [D, 9] f32 inverse pixel-space homographies
    valid: jnp.ndarray      # [] bool


def _fwd_terms(src_proj, ref_proj):
    rel = jnp.matmul(
        src_proj, jnp.linalg.inv(ref_proj), precision=lax.Precision.HIGHEST
    )
    return rel[:3, :3], rel[:3, 3]


def _pixel_homographies(src_proj, ref_proj, depth_values, H, W):
    """G_d: ref pixel (x, y, 1) -> homogeneous effective src sample coords
    (xe, ye) — the exact pixel-space map of the forward kernel."""
    rot, trans = _fwd_terms(src_proj, ref_proj)
    inv_d = (1.0 / depth_values).astype(jnp.float32)  # [D]
    e3 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    H_d = rot[None] + inv_d[:, None, None] * trans[None, :, None] * e3[None, None, :]
    sx = W / (W - 1.0)
    sy = H / (H - 1.0)
    A = jnp.array([[sx, 0, -0.5], [0, sy, -0.5], [0, 0, 1]], jnp.float32)
    return jnp.einsum("ij,djk->dik", A, H_d)  # [D, 3, 3]


def _inverse_coords(inv_g, q, p):
    """Apply G_d^{-1} (rows of inv_g, [9]) to src pixel (q, p) -> ref (x, y)."""
    den = inv_g[6] * q + inv_g[7] * p + inv_g[8]
    x = (inv_g[0] * q + inv_g[1] * p + inv_g[2]) / den
    y = (inv_g[3] * q + inv_g[4] * p + inv_g[5]) / den
    return x, y


def _support_bounds(src_proj, ref_proj, depth_values, H, W):
    """Per (d, src row, src x-block): bounds of the ref-pixel support.

    A candidate ref pixel (x, y) contributes to src pixel (q, p) iff its
    forward sample coordinate lies within 1 px: equivalently x lies between
    the inverse images of q-1 and q+1 (projective maps are monotonic along
    rows), and y between those of p-1 and p+1. Evaluating the inverse map
    at q_edges±1 / p±1 therefore gives exact support bounds per block.

    Returns (x_lo, x_hi, y_lo, y_hi, x_star_lo, x_star_hi, x_rad) as f32
    [D, H, nXB] arrays (x_star_* bound the anchor floor(x*))."""
    nXB = -(-W // TILE_W)
    D = depth_values.shape[0]
    G = _pixel_homographies(src_proj, ref_proj, depth_values, H, W)
    inv_g = jax.vmap(lambda m: jnp.linalg.inv(m))(G).reshape(D, 9)
    inv_g = inv_g / inv_g[:, 8:9]

    q_edges = jnp.stack(
        [jnp.arange(nXB) * TILE_W,
         jnp.minimum((jnp.arange(nXB) + 1) * TILE_W - 1, W - 1)],
        axis=-1,
    ).astype(jnp.float32)  # [nXB, 2]
    qs = jnp.stack([q_edges - 1.0, q_edges, q_edges + 1.0], -1)  # [nXB, 2, 3]
    ps = jnp.arange(H, dtype=jnp.float32)
    pss = jnp.stack([ps - 1.0, ps, ps + 1.0], -1)  # [H, 3]

    def per_d(g9):
        return _inverse_coords(
            g9, qs[None, :, :, :, None], pss[:, None, None, None, :]
        )  # [H, nXB, 2, 3, 3] each (q-edge, q±1, p±1)

    x_all, y_all = jax.vmap(per_d)(inv_g)  # [D, H, nXB, 2, 3, 3]

    # denominator sign uniformity: the corner-evaluated support bounds are
    # exact only while each map is monotonic over the evaluated region; both
    # denominators are AFFINE in the pixel coords per plane, so a uniform
    # sign at the corners is exact over the whole image. A sign change
    # (camera crossing the plane at infinity) must invalidate the plan.
    iq = jnp.array([-1.0, float(W)], jnp.float32)  # support evals reach ±1
    ip = jnp.array([-1.0, float(H)], jnp.float32)
    inv_den = (
        inv_g[:, 6, None, None] * iq[None, None, :]
        + inv_g[:, 7, None, None] * ip[None, :, None]
        + inv_g[:, 8, None, None]
    )
    fwd_den = (
        G[:, 2, 0, None, None] * iq[None, None, :]
        + G[:, 2, 1, None, None] * ip[None, :, None]
        + G[:, 2, 2, None, None]
    )

    def _uniform(d):
        return jnp.all(d > 1e-6) | jnp.all(d < -1e-6)

    den_ok = _uniform(inv_den) & _uniform(fwd_den)
    x_lo = jnp.min(x_all, axis=(-3, -2, -1))
    x_hi = jnp.max(x_all, axis=(-3, -2, -1))
    y_lo = jnp.min(y_all, axis=(-3, -2, -1))
    y_hi = jnp.max(y_all, axis=(-3, -2, -1))
    # anchor (= floor(x*(q))) bounds and max support radius around x*
    x_star = x_all[..., 1, 1]  # [D, H, nXB, 2]
    x_star_lo = jnp.min(x_star, axis=-1)
    x_star_hi = jnp.max(x_star, axis=-1)
    x_rad = jnp.max(
        jnp.abs(x_all[..., 0, 1] - x_star) , axis=-1
    )
    x_rad = jnp.maximum(
        x_rad, jnp.max(jnp.abs(x_all[..., 2, 1] - x_star), axis=-1)
    )
    finite = (
        jnp.all(jnp.isfinite(x_all)) & jnp.all(jnp.isfinite(y_all)) & den_ok
    )
    return x_lo, x_hi, y_lo, y_hi, x_star_lo, x_star_hi, x_rad, finite


def suggest_grad_envelope(src_projs, ref_proj, depth_values, height, width) -> dict:
    """Host-side: (kx, yspan, pr, pcp) covering all source views of a rig."""
    H, W = height, width
    kx_need, yspan_need, ydrift, pspan = 2, 2, 2, 8
    # planning is host-side math: jit it onto the CPU backend with NUMPY
    # (uncommitted) inputs — eager op dispatch through the TPU tunnel costs
    # a per-op compile, and axon->cpu transfers of committed arrays stall
    cpu = jax.local_devices(backend="cpu")[0]
    bounds = jax.jit(functools.partial(_support_bounds, H=H, W=W))
    ref_np = jax.device_put(np.asarray(ref_proj, np.float32), cpu)
    dv_np = jax.device_put(np.asarray(depth_values, np.float32), cpu)
    for src_proj in np.asarray(src_projs, np.float32).reshape(-1, 4, 4):
        x_lo, x_hi, y_lo, y_hi, xs_lo, xs_hi, x_rad, _f = map(
            np.asarray, bounds(jax.device_put(src_proj, cpu), ref_np, dv_np)
        )
        kx_need = max(kx_need, 2 * (int(np.ceil(x_rad.max())) + 1))
        yspan_need = max(
            yspan_need, int(np.ceil((y_hi - y_lo).max())) + 2
        )
        # the patch is per (tile, d): cover the 8-row band extent per plane
        D, Hn, nXB = y_lo.shape
        nYB = -(-Hn // TILE_H)

        def banded(a, fill):
            pad = np.full((D, nYB * TILE_H - Hn, nXB), fill, a.dtype)
            return np.concatenate([a, pad], 1).reshape(D, nYB, TILE_H, nXB)

        band_y = banded(y_hi, -1e9).max(2) - banded(y_lo, 1e9).min(2)
        ydrift = max(ydrift, int(np.ceil(band_y.max())) + 2)
        p_lo = np.floor(x_lo).astype(np.int64) >> 1
        p_hi = (np.floor(x_hi).astype(np.int64) + 2) >> 1
        band_p = banded(p_hi, -(10 ** 9)).max(2) - banded(p_lo, 10 ** 9).min(2)
        pspan = max(pspan, int(band_p.max()) + 2)

    kx = kx_need + (kx_need % 2)
    yspan = yspan_need
    pr = -(-max(ydrift + 2, yspan + 2) // 8) * 8
    pcp = 128 * (-(-(pspan + 128) // 128))
    return {"kx": kx, "yspan": yspan, "pr": pr, "pcp": max(pcp, 256)}


def plan_grad(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    height: int,
    width: int,
    *,
    kx: int = KX,
    yspan: int = YSPAN_G,
    pr: int = PRG,
    pcp: int = PCPG,
) -> GradPlan:
    """Support-bound the inverse map to place windows over ref-grad space.

    Evaluated per (depth, src row, src x-block) directly (no monotonicity in
    d is assumed — the inverse coords are computed for every plane)."""
    H, W = height, width   # ref == src dims for MVSNet features
    nYB = -(-H // TILE_H)
    nXB = -(-W // TILE_W)
    D = depth_values.shape[0]
    Wp = -(-W // 2)
    pad_h = nYB * TILE_H - H
    big = jnp.iinfo(jnp.int32).max // 4

    G = _pixel_homographies(src_proj, ref_proj, depth_values, H, W)
    inv_g = jax.vmap(lambda m: jnp.linalg.inv(m))(G).reshape(D, 9)
    inv_g = inv_g / inv_g[:, 8:9]  # normalize so the kernel skips one divide

    x_lo, x_hi, y_lo, y_hi, xs_lo, xs_hi, x_rad, finite = _support_bounds(
        src_proj, ref_proj, depth_values, H, W
    )

    # support rows/cols needed (integers), and the kernel's gather window
    # [base, base+128) in pair space that must contain every nonzero-weight
    # candidate's pair index
    ya = jnp.floor(y_lo).astype(jnp.int32)                 # first window row
    yz = jnp.floor(y_hi).astype(jnp.int32) + 1             # last needed row
    # kernel candidate box: [floor(x*) - (kx//2 - 1), floor(x*) + kx//2];
    # gather indices of its nonzero-weight members span the support cols
    xi_lo = jnp.minimum(
        jnp.floor(x_lo).astype(jnp.int32),
        jnp.floor(xs_lo).astype(jnp.int32) - (kx // 2 - 1),
    )
    xi_hi = jnp.maximum(
        jnp.floor(x_hi).astype(jnp.int32) + 1,
        jnp.floor(xs_hi).astype(jnp.int32) + kx // 2,
    )
    p_lo = xi_lo >> 1
    p_hi = (xi_hi + 1) >> 1

    def banded(a, pad_value=0, mode="constant"):
        if mode == "edge":
            a = jnp.pad(a, ((0, 0), (0, pad_h), (0, 0)), mode="edge")
        else:
            a = jnp.pad(a, ((0, 0), (0, pad_h), (0, 0)), constant_values=pad_value)
        return a.reshape(D, nYB, TILE_H, nXB)

    patch_y0 = jnp.min(banded(ya, big), axis=2) - 1          # [D, nYB, nXB]
    patch_y0 = jnp.clip(patch_y0, 0, max(H - pr, 0))
    patch_x0p = jnp.min(banded(p_lo, big), axis=2) - 1
    patch_x0p = (jnp.clip(patch_x0p, 0, max(Wp - pcp, 0)) // 128) * 128

    y_lo_b = banded(ya, mode="edge")
    p_lo_b = banded(p_lo, mode="edge")
    woy = jnp.clip(y_lo_b - patch_y0[:, :, None, :], 0, pr - yspan)
    # 128-aligned 256-lane window base (two clipped gathers + select in the
    # kernel instead of pltpu.roll — same change as sweep_variance.plan_sweep,
    # where the roll measured ~7x the rest of the kernel)
    if pcp >= 256:
        base = (
            jnp.clip(p_lo_b - patch_x0p[:, :, None, :], 0, pcp - 256) // 128
        ) * 128
    else:
        base = jnp.zeros_like(p_lo_b)

    # validity:
    #  - the kx candidate box covers the support radius around x*,
    #  - yspan window rows cover the y support,
    #  - one 128-lane gather window covers the pair span,
    #  - the per-(tile, d) patch covers its windows.
    box_ok = jnp.all(x_rad + 1.0 <= kx // 2)
    y_need = banded(yz - ya + 1)
    p_span = banded(p_hi - p_lo + 1)
    fits = (p_span <= 128) & (y_need <= yspan)
    p_hi_b = banded(p_hi, mode="edge")
    y_hi_b = banded(yz, mode="edge")
    covers = (
        (jnp.minimum(p_hi_b, Wp - 1) < patch_x0p[:, :, None, :] + pcp)
        & (jnp.maximum(p_lo_b, 0) >= patch_x0p[:, :, None, :])
        & (jnp.minimum(y_hi_b, H - 1) < patch_y0[:, :, None, :] + pr)
        & (jnp.maximum(y_lo_b, 0) >= patch_y0[:, :, None, :])
    )
    valid = jnp.all(fits & covers) & box_ok & finite

    return GradPlan(
        patch_y0.reshape(D, -1),
        patch_x0p.reshape(D, -1),
        woy.astype(jnp.int32),
        base.astype(jnp.int32),
        inv_g.astype(jnp.float32),
        valid,
    )


def _split_pairs(gT: jnp.ndarray, Wpp: int):
    """[D, H, C, W] -> (P0, P1) [D, Hp?, C, Wpp] even/odd column split."""
    D, H, C, W = gT.shape
    if W % 2:
        gT = jnp.pad(gT, ((0, 0), (0, 0), (0, 0), (0, 1)))
    p0 = gT[..., 0::2]
    p1 = gT[..., 1::2]
    Wp = p0.shape[-1]
    pad = ((0, 0), (0, 0), (0, 0), (0, Wpp - Wp))
    return jnp.pad(p0, pad), jnp.pad(p1, pad)


def _grad_kernel(
    # prefetch scalars
    rot_ref,       # [9] f32 forward relative rotation
    trans_ref,     # [3] f32
    invd_ref,      # [D] f32
    invg_ref,      # [D, 9] f32 inverse pixel homographies (normalized)
    patch_y0_ref,  # [D, nYB*nXB] i32
    patch_x0p_ref,  # [D, nYB*nXB] i32
    # array inputs
    g0_hbm,        # [D, Hp, C, Wpp] f32 even ref cols (ANY/HBM)
    g1_hbm,        # [D, Hp, C, Wpp] f32 odd ref cols
    woy_ref,       # [1, 1, TILE_H, nXB] SMEM block
    base_ref,      # [1, 1, TILE_H, nXB] SMEM block
    # outputs
    out_ref,       # [TILE_H, C, TILE_W] block, accumulated over d
    # scratch
    patch0,        # [2, pr, C, pcp] VMEM (double-buffered)
    patch1,        # [2, pr, C, pcp] VMEM
    sems,          # DMA semaphores [2, 2]
    *,
    D: int,
    H: int,
    W: int,
    C: int,
    nXB: int,
    kx: int,
    yspan: int,
    pr: int,
    pcp: int,
):
    yb = pl.program_id(0)
    xb = pl.program_id(1)
    d = pl.program_id(2)
    tile = yb * nXB + xb

    def make_dma(dd, slot):
        py0 = patch_y0_ref[dd, tile]
        px0 = pl.multiple_of(patch_x0p_ref[dd, tile], 128)
        cp0 = pltpu.make_async_copy(
            g0_hbm.at[dd, pl.ds(py0, pr), :, pl.ds(px0, pcp)],
            patch0.at[slot], sems.at[slot, 0],
        )
        cp1 = pltpu.make_async_copy(
            g1_hbm.at[dd, pl.ds(py0, pr), :, pl.ds(px0, pcp)],
            patch1.at[slot], sems.at[slot, 1],
        )
        return cp0, cp1

    slot = d % 2

    # double buffer: d's patch was started at step d-1 (or here for d == 0);
    # wait for it, then prefetch (d+1)'s into the other slot
    @pl.when(d == 0)
    def _():
        for cp in make_dma(0, 0):
            cp.start()

    for cp in make_dma(d, slot):
        cp.wait()

    @pl.when(d + 1 < D)
    def _():
        for cp in make_dma(d + 1, (d + 1) % 2):
            cp.start()

    # zero the accumulator block at the first depth plane of each tile
    @pl.when(d == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    inv_d = invd_ref[d]
    rot = [rot_ref[i] for i in range(9)]
    tr = [trans_ref[i] for i in range(3)]
    g9 = [invg_ref[d, i] for i in range(9)]
    py0 = patch_y0_ref[d, tile]
    px0 = patch_x0p_ref[d, tile]

    # src pixel coordinates of this tile
    p_out = (yb * TILE_H + lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
    q_out = (xb * TILE_W + lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)

    # inverse-mapped x anchor (ref pixel space); inv_g normalized (g8 == 1)
    iden = g9[6] * q_out + g9[7] * p_out + g9[8]
    x_star = (g9[0] * q_out + g9[1] * p_out + g9[2]) / iden
    xa = jnp.floor(x_star).astype(jnp.int32) - (kx // 2 - 1)

    # Forward-evaluated tent weight of candidate ref pixel (x, y) for the
    # src pixels (q_out, p_out) of row r: w = tent(q - xe) * tent(p - ye),
    # with xe/ye from the forward kernel's exact f32 formulas. Candidate
    # rows are enumerated by the window rows themselves (no dy loop): a
    # window row outside the bilinear support simply yields zero weight.
    sxn = W / (W - 1.0)
    syn = H / (H - 1.0)

    def fwd_w(xc, yc_f, q_r, p_r):
        xf = xc.astype(jnp.float32)
        den = rot[6] * xf + rot[7] * yc_f + rot[8] + tr[2] * inv_d
        xe = (rot[0] * xf + rot[1] * yc_f + rot[2] + tr[0] * inv_d) / den * sxn - 0.5
        ye = (rot[3] * xf + rot[4] * yc_f + rot[5] + tr[1] * inv_d) / den * syn - 0.5
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(q_r - xe))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(p_r - ye))
        inb = ((xc >= 0) & (xc <= W - 1)).astype(jnp.float32)
        return wx * wy * inb

    n_cg = C // 8
    for r in range(TILE_H):
        woy = woy_ref[0, 0, r, xb]
        base = base_ref[0, 0, r, xb]  # multiple of 128 (plan_grad)

        xa_r = xa[r : r + 1]
        q_r = q_out[r : r + 1]
        p_r = p_out[r : r + 1]

        accs = [out_ref[r, pl.ds(cg * 8, 8), :] for cg in range(n_cg)]

        for ry in range(yspan):
            row_abs = py0 + woy + ry  # candidate ref row (scalar)
            in_img = (row_abs >= 0) & (row_abs <= H - 1)
            yc_f = row_abs.astype(jnp.float32)

            # 256-lane window rows at the 128-aligned base, shared across
            # the candidate-column loop; taps resolve with two clipped
            # vreg-local gathers + a select (rolls were ~7x slower)
            win0, win1 = [], []
            for cg in range(n_cg):
                if pcp > 128:
                    p0row = patch0[
                        slot, woy + ry, pl.ds(cg * 8, 8),
                        pl.ds(pl.multiple_of(base, 128), 256),
                    ]
                    p1row = patch1[
                        slot, woy + ry, pl.ds(cg * 8, 8),
                        pl.ds(pl.multiple_of(base, 128), 256),
                    ]
                else:
                    p0row = patch0[slot, woy + ry, pl.ds(cg * 8, 8), :]
                    p1row = patch1[slot, woy + ry, pl.ds(cg * 8, 8), :]
                win0.append(p0row)
                win1.append(p1row)

            for dx0 in range(0, kx, 2):
                xcand0 = xa_r + dx0
                xcand1 = xa_r + dx0 + 1
                w0 = fwd_w(xcand0, yc_f, q_r, p_r)
                w1 = fwd_w(xcand1, yc_f, q_r, p_r)
                row_m = in_img.astype(jnp.float32)
                w0 = w0 * row_m
                w1 = w1 * row_m

                # parity routing: even global col -> P0 at col>>1, odd -> P1
                par0_odd = (xcand0 & 1) == 1
                kP0 = jnp.where(par0_odd, xcand1, xcand0) >> 1
                kP1 = jnp.where(par0_odd, xcand0, xcand1) >> 1
                wP0 = jnp.where(par0_odd, w1, w0)
                wP1 = jnp.where(par0_odd, w0, w1)

                i0 = kP0 - (px0 + base)
                i1 = kP1 - (px0 + base)
                if pcp > 128:
                    s0 = jnp.broadcast_to(i0 < 128, (8, TILE_W))
                    s1 = jnp.broadcast_to(i1 < 128, (8, TILE_W))
                    i0_hi = jnp.broadcast_to(
                        jnp.clip(i0 - 128, 0, 127), (8, TILE_W)
                    )
                    i1_hi = jnp.broadcast_to(
                        jnp.clip(i1 - 128, 0, 127), (8, TILE_W)
                    )
                i0_lo = jnp.broadcast_to(jnp.clip(i0, 0, 127), (8, TILE_W))
                i1_lo = jnp.broadcast_to(jnp.clip(i1, 0, 127), (8, TILE_W))

                for cg in range(n_cg):
                    if pcp > 128:
                        v0 = jnp.where(
                            s0,
                            jnp.take_along_axis(win0[cg][:, :128], i0_lo, axis=1),
                            jnp.take_along_axis(win0[cg][:, 128:], i0_hi, axis=1),
                        )
                        v1 = jnp.where(
                            s1,
                            jnp.take_along_axis(win1[cg][:, :128], i1_lo, axis=1),
                            jnp.take_along_axis(win1[cg][:, 128:], i1_hi, axis=1),
                        )
                    else:
                        v0 = jnp.take_along_axis(win0[cg], i0_lo, axis=1)
                        v1 = jnp.take_along_axis(win1[cg], i1_lo, axis=1)
                    accs[cg] = accs[cg] + v0 * wP0 + v1 * wP1

        for cg in range(n_cg):
            out_ref[r, pl.ds(cg * 8, 8), :] = accs[cg]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "kx", "yspan", "pr", "pcp", "interpret"),
)
def warp_grad_pallas(
    g: jnp.ndarray,            # [D, H, W, C] grad wrt warped volume
    src_proj: jnp.ndarray,     # [4, 4]
    ref_proj: jnp.ndarray,     # [4, 4]
    depth_values: jnp.ndarray,  # [D]
    height: int | None = None,
    width: int | None = None,
    kx: int = KX,
    yspan: int = YSPAN_G,
    pr: int = PRG,
    pcp: int = PCPG,
    interpret: bool = False,
):
    """dsrc [H, W, C] for the plane-sweep warp, plus the plan validity."""
    D, H, W, C = g.shape
    nYB = -(-H // TILE_H)
    nXB = -(-W // TILE_W)
    Wp = -(-W // 2)
    Wpp = max(pcp, 128 * -(-Wp // 128))
    Hp = max(nYB * TILE_H, pr)

    plan = plan_grad(
        src_proj, ref_proj, depth_values, H, W,
        kx=kx, yspan=yspan, pr=pr, pcp=pcp,
    )
    rot, trans = _fwd_terms(src_proj, ref_proj)

    gT = jnp.transpose(g.astype(jnp.float32), (0, 1, 3, 2))  # [D, H, C, W]
    if Hp > H:
        gT = jnp.pad(gT, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    g0, g1 = _split_pairs(gT, Wpp)

    kernel = functools.partial(
        _grad_kernel, D=D, H=H, W=W, C=C, nXB=nXB,
        kx=kx, yspan=yspan, pr=pr, pcp=pcp,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nYB, nXB, D),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
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
                (TILE_H, C, TILE_W),
                lambda yb, xb, d, *refs: (yb, 0, xb),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, pr, C, pcp), jnp.float32),
                pltpu.VMEM((2, pr, C, pcp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nYB * TILE_H, C, nXB * TILE_W), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.reshape(rot, (9,)).astype(jnp.float32),
        trans.astype(jnp.float32),
        (1.0 / depth_values).astype(jnp.float32),
        plan.inv_g,
        plan.patch_y0,
        plan.patch_x0p,
        g0,
        g1,
        plan.woy,
        plan.base,
    )
    dsrc = jnp.transpose(out[:H], (0, 2, 1))[:, :W, :]  # [H, W, C]
    return dsrc, plan.valid


@functools.lru_cache(maxsize=None)
def make_warp_with_pallas_grad(kx: int, yspan: int, pr: int, pcp: int,
                               interpret: bool = False):
    """Build a warp_src_feature drop-in whose VJP runs the inverse-warp
    Pallas kernel instead of XLA's scatter-add transpose.

    The forward IS ops.sampling.warp_src_feature (bit-identical primal);
    only the backward changes. Gradients flow to ``src_fea`` only, matching
    the forward's stop-gradient semantics on the sweep coordinates.

    The backward runs the kernel UNCONDITIONALLY (a lax.cond fallback would
    degrade to running both branches under vmap/batching). Callers must
    size the envelope with suggest_grad_envelope over their rig family and
    monitor ``plan_grad(...).valid`` as a cheap in-graph health metric.
    The paired training path (ops/paired_sweep.py — what MVSNet uses when
    both Pallas envelopes are set) surfaces exactly that check as its
    ``plan_valid`` output, which rides the train-step aux to the Trainer's
    per-step validity check."""
    from ..sampling import warp_src_feature

    env = dict(kx=kx, yspan=yspan, pr=pr, pcp=pcp)

    @jax.custom_vjp
    def warp(src_fea, src_proj, ref_proj, depth_values):
        return warp_src_feature(src_fea, src_proj, ref_proj, depth_values)

    def fwd(src_fea, src_proj, ref_proj, depth_values):
        out = warp_src_feature(src_fea, src_proj, ref_proj, depth_values)
        # NB: no feature residuals — the backward needs only geometry
        return out, (src_proj, ref_proj, depth_values)

    def bwd(res, g):
        src_proj, ref_proj, depth_values = res

        def one(args):
            g_b, sp, rp, dv = args
            dsrc, _valid = warp_grad_pallas(
                g_b.astype(jnp.float32), sp, rp, dv,
                interpret=interpret, **env,
            )
            return dsrc

        dsrc = lax.map(one, (g, src_proj, ref_proj, depth_values))
        # the warp preserves dtype, so the cotangent's dtype is src_fea's
        return (dsrc.astype(g.dtype), None, None, None)

    warp.defvjp(fwd, bwd)
    return warp
