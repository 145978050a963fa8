"""Fused plane-sweep variance Pallas TPU kernel (warp kernel v2).

Computes the entire multi-view variance cost volume of MVSNet's plane sweep
(/root/reference/models/mvsnet.py:145-177 — homo_warping + running sum/sum^2
+ variance) in ONE kernel: the warped per-view volumes never exist in HBM.

Design (what changed vs plane_sweep_warp.py v1, and why it's fast):

  * Even/odd column split ("pair parity"): the source features are pre-split
    into P0 = even columns and P1 = odd columns. The two bilinear x-taps
    (x0, x0+1) always live at pair indices kP0 = (x0+1)>>1 in P0 and
    kP1 = x0>>1 in P1, so each tap needs exactly ONE vreg-local gather —
    and the index span of a 128-wide output tile HALVES to ~66 pairs,
    which fits a single 128-lane gather window.
  * 128-aligned 256-lane windows: Mosaic's dynamic_gather is vreg-local
    (128 lanes), and the per-plane tap window's base is arbitrary. Each
    patch row is sliced as a 256-lane window at a 128-ALIGNED base (lane-dim
    dynamic slices must be 128-aligned) and each tap resolves with two
    clipped vreg-local gathers + a lane select. This replaced a
    `pltpu.roll` by a traced shift, which Mosaic emulates so expensively it
    was ~7x the REST of the kernel combined (measured 184 ms with rolls vs
    45 ms with gather+select vs 25 ms roll-free lower bound at DTU-full).
  * bf16-packed-in-f32 patches: channel c and c+16 are bit-packed into one
    f32 word (bf16 is the top half of f32), halving both VMEM footprint and
    gather count; values unpack exactly (bitcast+shift), interpolation runs
    in f32.
  * All V-1 source-view patches are staged in VMEM per output tile, the
    view loop runs inside the kernel, and sum/sum^2 accumulate in vector
    registers; the kernel emits the variance volume directly. This removes
    the per-view warped-volume HBM write + the XLA sum/sum^2 accumulation
    traffic entirely (~60 ms at the DTU-full config) and decouples memory
    from depth chunking.

Window planning reuses v1's corner-evaluation scheme (projective coordinates
are monotonic along rows and in 1/depth, so extremes sit at corners), done
in-jit with the exact same f32 formulas the kernel evaluates, which keeps the
margin-free windows exact. `plan_sweep` returns a validity flag; callers fall
back to the XLA sweep (ops/plane_sweep.py) when a rig exceeds the envelope.

Grid sample semantics match torch F.grid_sample zeros padding under the
reference's align_corners composition bit-for-bit (see ops/sampling.py and
/root/reference/models/module.py:96-139).
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

# default static envelope; override per rig via suggest_envelope()
YSPAN = 4    # patch rows examined per output row
PR = 32      # patch rows staged per tile (must cover the full-depth y drift)
PCP = 256    # patch cols in PAIR space (=512 px), multiple of 128


def merge_envelopes(acc: dict, new: dict) -> dict:
    """Merge suggest_envelope dicts over samples: scalar fields by max,
    the per-view "yspan" tuple elementwise (slot k = k-th source view of
    every sample; loaders emit sources in nearest-first pair order, so
    slots are comparable across samples)."""
    if not acc:
        return dict(new)
    out = {}
    for k, v in new.items():
        if isinstance(v, tuple):
            prev = acc.get(k, v)
            out[k] = tuple(max(a, b) for a, b in zip(prev, v))
        else:
            out[k] = max(acc.get(k, 0), v)
    return out


def _yspans_tuple(yspan, Vs: int) -> tuple[int, ...]:
    """Normalize the static yspan envelope to one value per source view.

    yspan is the kernel's dominant cost knob (each extra tap row is a full
    gather+fma pass: measured +16.9 ms per increment over 4 views at
    DTU-full). Views of a rig need different spans — in a ring rig the
    nearest neighbours need 2 while the next ring steps need 3+ — and the
    view loop is statically unrolled, so each view gets its own."""
    if isinstance(yspan, (tuple, list)):
        ys = tuple(int(y) for y in yspan)
        if len(ys) != Vs:
            raise ValueError(
                f"per-view yspan needs {Vs} entries, got {len(ys)}"
            )
        return ys
    return (int(yspan),) * Vs


class SweepPlan(NamedTuple):
    """Per-view window plan, all stacked over the Vs = V-1 source views."""

    patch_y0: jnp.ndarray  # [Vs, nYB*nXB] i32 patch origin rows (clamped)
    patch_x0p: jnp.ndarray  # [Vs, nYB*nXB] i32 pair-space origin (128-aligned)
    woy: jnp.ndarray       # [Vs, D, nYB, TILE_H, nXB] i32 window row offset
    base: jnp.ndarray      # [Vs, D, nYB, TILE_H, nXB] i32 pair-window base
    nry: jnp.ndarray       # [Vs, D, nYB, TILE_H, nXB] i32 exact tap rows
                           # needed at this position (in [2, yspan_v]);
                           # drives the rowskip kernel variant
    valid: jnp.ndarray     # [] bool — geometry fits the envelope


def _coord_terms(src_proj, ref_proj):
    rel = jnp.matmul(
        src_proj, jnp.linalg.inv(ref_proj), precision=lax.Precision.HIGHEST
    )
    return rel[:3, :3], rel[:3, 3]


def _sample_coord(rot, trans, x, y, inv_d, W, H):
    """Effective f32 sample coords for ref pixel (x, y) at inverse depth
    inv_d — the reference's align_corners=True normalize composed with
    torch's align_corners=False unnormalize (ops/sampling.py)."""
    den = rot[2, 0] * x + rot[2, 1] * y + rot[2, 2] + trans[2] * inv_d
    xs = (rot[0, 0] * x + rot[0, 1] * y + rot[0, 2] + trans[0] * inv_d) / den
    ys = (rot[1, 0] * x + rot[1, 1] * y + rot[1, 2] + trans[1] * inv_d) / den
    xe = xs * (W / (W - 1.0)) - 0.5
    ye = ys * (H / (H - 1.0)) - 0.5
    return xe, ye


def _corner_spans(src_proj, ref_proj, depth_values, H, W, with_den_ok=False):
    """[D, H, nXB] lo/hi tap bounds per (plane, row, x-block): x in PIXEL
    space, y in row space. Bounds are inclusive tap ranges (x0 min, x0+1
    max).

    with_den_ok additionally returns a scalar bool: True iff the projective
    denominator keeps a uniform sign (bounded away from zero) over every
    evaluated corner. Corner evaluation bounds the tap span only while the
    map is monotonic across a block; a denominator sign change (camera
    crossing the plane at infinity inside the image) breaks that, so plans
    must report invalid and force the XLA fallback."""
    nXB = -(-W // TILE_W)
    rot, trans = _coord_terms(src_proj, ref_proj)
    inv_d = (1.0 / depth_values).astype(jnp.float32)
    xs_edges = jnp.stack(
        [jnp.arange(nXB) * TILE_W,
         jnp.minimum((jnp.arange(nXB) + 1) * TILE_W - 1, W - 1)],
        axis=-1,
    ).astype(jnp.float32)  # [nXB, 2]
    ys = jnp.arange(H, dtype=jnp.float32)
    xe, ye = _sample_coord(
        rot, trans,
        xs_edges[None, None], ys[None, :, None, None],
        inv_d[:, None, None, None], W, H,
    )  # [D, H, nXB, 2]
    x_lo = jnp.floor(jnp.min(xe, axis=-1)).astype(jnp.int32)        # min x0
    x_hi = jnp.floor(jnp.max(xe, axis=-1)).astype(jnp.int32) + 1    # max x0+1
    y_lo = jnp.floor(jnp.min(ye, axis=-1)).astype(jnp.int32)
    y_hi = jnp.floor(jnp.max(ye, axis=-1)).astype(jnp.int32) + 1
    if not with_den_ok:
        return x_lo, x_hi, y_lo, y_hi
    den = (
        rot[2, 0] * xs_edges[None, None]
        + rot[2, 1] * ys[None, :, None, None]
        + rot[2, 2]
        + trans[2] * inv_d[:, None, None, None]
    )
    den_ok = jnp.all(den > 1e-6) | jnp.all(den < -1e-6)
    return x_lo, x_hi, y_lo, y_hi, den_ok


def suggest_envelope(src_projs, ref_proj, depth_values, height, width) -> dict:
    """Host-side: tightest (yspan, pr, pcp) covering all source views of a
    rig. Returns static kwargs for sweep_variance_pallas (one compile per
    envelope)."""
    H, W = height, width
    yspans, y_drift, x_drift_p = [], 0, 0
    # planning is host-side math: jit it onto the CPU backend with NUMPY
    # (uncommitted) inputs — eager op dispatch through the TPU tunnel costs
    # a per-op compile, and axon->cpu transfers of committed arrays stall
    cpu = jax.local_devices(backend="cpu")[0]
    spans = jax.jit(functools.partial(_corner_spans, H=H, W=W))
    ref_np = jax.device_put(np.asarray(ref_proj, np.float32), cpu)
    dv_np = jax.device_put(np.asarray(depth_values, np.float32), cpu)
    for src_proj in np.asarray(src_projs, np.float32).reshape(-1, 4, 4):
        x_lo, x_hi, y_lo, y_hi = map(
            np.asarray, spans(jax.device_put(src_proj, cpu), ref_np, dv_np)
        )
        inter = (x_lo < W) & (x_hi > 0) & (y_lo < H) & (y_hi > 0)
        y_need = int(np.where(inter, y_hi - y_lo + 1, 0).max())
        yspans.append(max(2, y_need))
        # per-tile full-depth drift (patch must cover all depth planes)
        ylo_t = np.where(inter, y_lo, np.iinfo(np.int32).max // 4)
        yhi_t = np.where(inter, y_hi, np.iinfo(np.int32).min // 4)
        drift = yhi_t.max(axis=0) - ylo_t.min(axis=0) + 1  # [H, nXB]
        y_drift = max(y_drift, int(np.clip(drift, 0, None).max()))
        plo = np.where(inter, x_lo >> 1, np.iinfo(np.int32).max // 4)
        phi = np.where(inter, (x_hi + 1) >> 1, np.iinfo(np.int32).min // 4)
        pdrift = phi.max(axis=0) - plo.min(axis=0) + 1
        x_drift_p = max(x_drift_p, int(np.clip(pdrift, 0, None).max()))

    yspan = max(yspans) if yspans else 2
    # patch rows: tile adds TILE_H-1 rows of slope to the drift
    pr = -(-max(y_drift + TILE_H + 2, yspan + TILE_H) // 8) * 8
    pcp = 128 * (-(-(x_drift_p + TILE_W // 2 + 2 + 128) // 128))
    return {
        # per-view tap spans: each source view runs only its own tap-row
        # count in the kernel (a row is a full gather+fma pass — the
        # dominant cost); sweep_variance_pallas/plan_sweep accept the
        # tuple directly, or a plain int for a shared span
        "yspan": tuple(yspans),
        "pr": pr,
        "pcp": max(pcp, 256),
    }


def plan_sweep(
    src_projs: jnp.ndarray,   # [Vs, 4, 4]
    ref_proj: jnp.ndarray,    # [4, 4]
    depth_values: jnp.ndarray,  # [D]
    height: int,
    width: int,
    *,
    yspan: int | tuple[int, ...] = YSPAN,
    pr: int = PR,
    pcp: int = PCP,
) -> SweepPlan:
    """Corner-evaluate all source views; returns stacked plans + validity.
    ``yspan`` may be per-view (tuple of Vs ints, see _yspans_tuple)."""
    H, W = height, width
    nYB = -(-H // TILE_H)
    nXB = -(-W // TILE_W)
    D = depth_values.shape[0]
    Wp = -(-W // 2)  # pair-space width of P0/P1
    pad_h = nYB * TILE_H - H
    big = jnp.iinfo(jnp.int32).max // 4
    yspans = jnp.asarray(
        _yspans_tuple(yspan, src_projs.shape[0]), jnp.int32
    )

    def one_view(src_proj, yspan_v):
        x_lo, x_hi, y_lo, y_hi, den_ok = _corner_spans(
            src_proj, ref_proj, depth_values, H, W, with_den_ok=True
        )
        p_lo = x_lo >> 1              # min pair tap (P1 min = x_lo>>1)
        p_hi = (x_hi + 1) >> 1        # max pair tap (P0 max = (x_hi+1)>>1)

        def banded(a, pad_value=0, mode="constant"):
            if mode == "edge":
                a = jnp.pad(a, ((0, 0), (0, pad_h), (0, 0)), mode="edge")
            else:
                a = jnp.pad(a, ((0, 0), (0, pad_h), (0, 0)), constant_values=pad_value)
            return a.reshape(D, nYB, TILE_H, nXB)

        patch_y0 = jnp.min(jnp.min(banded(y_lo, big), axis=2), axis=0) - 1
        patch_y0 = jnp.clip(patch_y0, 0, max(H - pr, 0))
        patch_x0p = jnp.min(jnp.min(banded(p_lo, big), axis=2), axis=0) - 1
        patch_x0p = (jnp.clip(patch_x0p, 0, max(Wp - pcp, 0)) // 128) * 128

        y_lo_b = banded(y_lo, mode="edge")
        y_hi_be = banded(y_hi, mode="edge")
        p_lo_b = banded(p_lo, mode="edge")
        woy = jnp.clip(y_lo_b - patch_y0[None, :, None, :], 0, pr - yspan_v)
        # exact tap rows needed at each (d, row, xb) position, relative to
        # the window start woy: the block's taps span [y_lo, y_hi] so
        # y_hi - (patch_y0 + woy) + 1 rows cover them. Bilinear always
        # needs >= 2 rows; the static envelope yspan_v is the cap (the
        # fits gate guarantees y_hi - y_lo + 1 <= yspan_v wherever the
        # block intersects the image).
        nry = jnp.clip(
            y_hi_be - patch_y0[None, :, None, :] - woy + 1, 2, yspan_v
        )
        # 128-ALIGNED window base: the kernel slices a 256-lane window at
        # `base` and covers the per-plane span (<=128 pairs by the fits
        # check) with two clipped vreg-local gathers + a select — no
        # pltpu.roll, which costs ~7x the rest of the kernel (measured:
        # 184 ms with rolls vs 25 ms without at the DTU-full config).
        # Flooring to 128 keeps p_lo inside: p_hi - base <= 127 + 127 < 256.
        if pcp >= 256:
            base = (
                jnp.clip(p_lo_b - patch_x0p[None, :, None, :], 0, pcp - 256)
                // 128
            ) * 128
        else:
            base = jnp.zeros_like(p_lo_b)
        p_hi_b = banded(p_hi, mode="edge")

        # validity: spans fit the envelope and the patch covers every
        # in-image window of its tile
        x_need = banded(x_hi - x_lo + 2)
        y_need = banded(y_hi - y_lo + 2)
        p_span = banded(p_hi - p_lo + 1)
        x_lo_q, y_lo_q = banded(x_lo), banded(y_lo)
        intersects = (
            (x_lo_q < W) & (x_lo_q + x_need > 0)
            & (y_lo_q < H) & (y_lo_q + y_need > 0)
        )
        fits = (p_span <= 128) & (y_need <= yspan_v + 1)
        y_hi_b = banded(y_hi, mode="edge")
        covers = (
            (jnp.minimum(p_hi_b, Wp - 1) < patch_x0p[None, :, None, :] + pcp)
            & (jnp.maximum(p_lo_b, 0) >= patch_x0p[None, :, None, :])
            & (jnp.minimum(y_hi_b + 1, H - 1) < patch_y0[None, :, None, :] + pr)
            & (jnp.maximum(y_lo_b, 0) >= patch_y0[None, :, None, :])
        )
        valid = jnp.all(jnp.where(intersects, fits & covers, True)) & den_ok
        return patch_y0.reshape(-1), patch_x0p.reshape(-1), woy, base, nry, valid

    py0, px0, woy, base, nry, valid = jax.vmap(one_view)(src_projs, yspans)
    return SweepPlan(py0, px0, woy, base, nry, jnp.all(valid))


def plan_is_valid(src_projs, ref_proj, depth_values, height, width, **env) -> jnp.ndarray:
    """Cheap traced validity check (same math as plan_sweep)."""
    return plan_sweep(
        src_projs, ref_proj, depth_values, height, width, **env
    ).valid


def pack_features(fea: jnp.ndarray):
    """[H, W, C=32] bf16 -> (P0, P1) each [H, 16, Wp] f32 with channel c and
    c+16 bit-packed into one f32 word (bf16 occupies the top 16 bits of f32,
    so unpacking is exact). P0 holds even columns, P1 odd columns."""
    H, W, C = fea.shape
    assert C == 32, f"kernel is specialized to C=32 features, got {C}"
    u16 = lax.bitcast_convert_type(fea.astype(jnp.bfloat16), jnp.uint16)
    lo = u16[..., :16].astype(jnp.uint32)          # channels 0..15
    hi = u16[..., 16:].astype(jnp.uint32)          # channels 16..31
    packed = lax.bitcast_convert_type(lo | (hi << 16), jnp.float32)  # [H,W,16]
    packed = jnp.transpose(packed, (0, 2, 1))      # [H, 16, W]
    if W % 2:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 1)))
    return packed[:, :, 0::2], packed[:, :, 1::2]  # [H, 16, Wp] x2


def _unpack(v):
    """Packed f32 vreg -> (channels c, channels c+16) f32 vregs, exact."""
    u = pltpu.bitcast(v, jnp.uint32)
    lo = pltpu.bitcast(u << jnp.uint32(16), jnp.float32)
    hi = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return lo, hi


def _sweep_kernel(
    # prefetch scalars
    rot_ref,        # [Vs, 9] f32 relative rotations (flattened)
    trans_ref,      # [Vs, 3] f32
    invd_ref,       # [D] f32
    patch_y0_ref,   # [Vs, nYB*nXB] i32
    patch_x0p_ref,  # [Vs, nYB*nXB] i32
    # array inputs
    p0_hbm,         # [Vs, Hp, 16, Wpp] f32 packed even cols (ANY/HBM)
    p1_hbm,         # [Vs, Hp, 16, Wpp] f32 packed odd cols
    ref_blk,        # [TILE_H, 16, TILE_W] f32 packed ref tile (VMEM block)
    woy_ref,        # [Vs, 1, 1, TILE_H, nXB] SMEM block
    base_ref,       # [Vs, 1, 1, TILE_H, nXB] SMEM block
    # rowskip only: nry_ref [Vs, 1, 1, TILE_H, nXB] SMEM block, then
    # outputs (warps_ref only present when emit_warps)
    *refs,          # out_ref [1, TILE_H, 32, TILE_W] variance block,
                    # [warps_ref [Vs, 1, TILE_H, 32, TILE_W] per-view warps,]
                    # patch0/patch1 [Vs, pr, 16, pcp] VMEM, sems [2*Vs]
                    # [wacc [4, 8, TILE_W] VMEM f32 (rowskip only)]
    Vs: int,
    V: int,
    H: int,
    W: int,
    nXB: int,
    yspans: tuple[int, ...],
    pr: int,
    pcp: int,
    emit_warps: bool,
    rowskip: bool,
):
    refs = list(refs)
    nry_ref = refs.pop(0) if rowskip else None
    out_ref = refs.pop(0)
    warps_ref = refs.pop(0) if emit_warps else None
    patch0, patch1, sems = refs[:3]
    wacc = refs[3] if rowskip else None
    yb = pl.program_id(0)
    xb = pl.program_id(1)
    d = pl.program_id(2)
    tile = yb * nXB + xb

    # --- stage all source-view patches once per tile (shared by all d) ---
    @pl.when(d == 0)
    def _():
        cps = []
        for v in range(Vs):
            py0 = patch_y0_ref[v, tile]
            px0 = pl.multiple_of(patch_x0p_ref[v, tile], 128)
            cp0 = pltpu.make_async_copy(
                p0_hbm.at[v, pl.ds(py0, pr), :, pl.ds(px0, pcp)],
                patch0.at[v], sems.at[2 * v],
            )
            cp1 = pltpu.make_async_copy(
                p1_hbm.at[v, pl.ds(py0, pr), :, pl.ds(px0, pcp)],
                patch1.at[v], sems.at[2 * v + 1],
            )
            cp0.start()
            cp1.start()
            cps += [cp0, cp1]
        for cp in cps:
            cp.wait()

    inv_d = invd_ref[d]
    inv_v = 1.0 / float(V)

    # --- tile-wide per-view warp geometry ---
    y_out = (yb * TILE_H + lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
    x_out = (xb * TILE_W + lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)

    view_data = []
    for v in range(Vs):
        rot = [rot_ref[v, i] for i in range(9)]
        tr = [trans_ref[v, i] for i in range(3)]
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

        # zeros-padding masks in original image coords
        m_x0 = ((x0 >= 0) & (x0 <= W - 1)).astype(jnp.float32)
        m_x1 = ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)).astype(jnp.float32)
        m_y0 = ((y0 >= 0) & (y0 <= H - 1)).astype(jnp.float32)
        m_y1 = ((y0 + 1 >= 0) & (y0 + 1 <= H - 1)).astype(jnp.float32)

        # pair-parity tap indices and weights (see module docstring)
        par_odd = (x0 & 1) == 1
        kP0 = (x0 + 1) >> 1
        kP1 = x0 >> 1
        wP0 = jnp.where(par_odd, wx * m_x1, (1.0 - wx) * m_x0)
        wP1 = jnp.where(par_odd, (1.0 - wx) * m_x0, wx * m_x1)

        w_y0 = (1.0 - wy) * m_y0
        w_y1 = wy * m_y1
        py0 = patch_y0_ref[v, tile]
        px0 = patch_x0p_ref[v, tile]
        view_data.append((kP0, kP1, wP0, wP1, w_y0, w_y1, y0, py0, px0))

    zero8 = jnp.zeros((1, TILE_W), jnp.float32)

    for r in range(TILE_H):
        # per-(row, cg) accumulators: [lo cg0, hi cg0, lo cg1, hi cg1]
        acc_s = [None] * 4
        acc_q = [None] * 4
        # reference view enters unwarped (mvsnet.py:145-147)
        for cg in range(2):
            rlo, rhi = _unpack(ref_blk[r, pl.ds(cg * 8, 8), :])
            for j, s in ((2 * cg, rlo), (2 * cg + 1, rhi)):
                acc_s[j] = s
                acc_q[j] = s * s

        for v in range(Vs):
            (kP0, kP1, wP0, wP1, w_y0, w_y1, y0, py0, px0) = view_data[v]
            woy = woy_ref[v, 0, 0, r, xb]
            base = base_ref[v, 0, 0, r, xb]  # multiple of 128 (plan_sweep)

            # Window indices relative to the 256-lane window at `base`:
            # valid taps land in [0, 256); each tap is resolved with two
            # clipped vreg-local gathers (lanes [0,128) and [128,256)) and
            # a lane select — pltpu.roll with a traced shift is ~7x slower
            # than this whole inner loop (see plan_sweep comment).
            i0 = kP0[r : r + 1] - (px0 + base)
            i1 = kP1[r : r + 1] - (px0 + base)
            s0 = jnp.broadcast_to(i0 < 128, (8, TILE_W))
            s1 = jnp.broadcast_to(i1 < 128, (8, TILE_W))
            i0_lo = jnp.broadcast_to(jnp.clip(i0, 0, 127), (8, TILE_W))
            i0_hi = jnp.broadcast_to(jnp.clip(i0 - 128, 0, 127), (8, TILE_W))
            i1_lo = jnp.broadcast_to(jnp.clip(i1, 0, 127), (8, TILE_W))
            i1_hi = jnp.broadcast_to(jnp.clip(i1 - 128, 0, 127), (8, TILE_W))
            wp0 = wP0[r : r + 1]
            wp1 = wP1[r : r + 1]
            y0l = y0[r : r + 1] - (py0 + woy)
            wy0_r = w_y0[r : r + 1]
            wy1_r = w_y1[r : r + 1]

            def row_taps(cg, ry):
                """One tap row for channel group ``cg`` at window row
                woy+ry: gather both x taps and return the x-interpolated
                (lo, hi) channel halves, NOT yet row-weighted."""
                if pcp > 128:
                    win0 = patch0[
                        v, woy + ry, pl.ds(cg * 8, 8),
                        pl.ds(pl.multiple_of(base, 128), 256),
                    ]
                    win1 = patch1[
                        v, woy + ry, pl.ds(cg * 8, 8),
                        pl.ds(pl.multiple_of(base, 128), 256),
                    ]
                    g0 = jnp.where(
                        s0,
                        jnp.take_along_axis(win0[:, :128], i0_lo, axis=1),
                        jnp.take_along_axis(win0[:, 128:], i0_hi, axis=1),
                    )
                    g1 = jnp.where(
                        s1,
                        jnp.take_along_axis(win1[:, :128], i1_lo, axis=1),
                        jnp.take_along_axis(win1[:, 128:], i1_hi, axis=1),
                    )
                else:
                    row0 = patch0[v, woy + ry, pl.ds(cg * 8, 8), :]
                    row1 = patch1[v, woy + ry, pl.ds(cg * 8, 8), :]
                    g0 = jnp.take_along_axis(row0, i0_lo, axis=1)
                    g1 = jnp.take_along_axis(row1, i1_lo, axis=1)
                g0lo, g0hi = _unpack(g0)
                g1lo, g1hi = _unpack(g1)
                return g0lo * wp0 + g1lo * wp1, g0hi * wp0 + g1hi * wp1

            def row_pass(ry, w4):
                """Accumulate tap row ``ry`` into the 4 running row sums
                (lo cg0, hi cg0, lo cg1, hi cg1). Every pass is a full
                gather+fma sweep — the kernel's dominant cost. Both
                channel groups run in one pass so the rowskip gate below
                fires once per skipped row, not once per channel group."""
                # row weight: taps y0/y0+1 select window rows ry
                yw = jnp.where(y0l == ry, wy0_r, 0.0) + jnp.where(
                    y0l == ry - 1, wy1_r, 0.0
                )
                out = list(w4)
                for cg in range(2):
                    xlo, xhi = row_taps(cg, ry)
                    out[2 * cg] = out[2 * cg] + xlo * yw
                    out[2 * cg + 1] = out[2 * cg + 1] + xhi * yw
                return tuple(out)

            n_static = yspans[v]
            w4 = (zero8, zero8, zero8, zero8)
            # bilinear taps always span 2 rows: rows 0-1 run unconditionally
            for ry in range(min(2, n_static) if rowskip else n_static):
                w4 = row_pass(ry, w4)
            if rowskip and n_static > 2:
                # Data-dependent row skipping: plan_sweep ships the exact
                # per-(v, d, row, xb) tap-row count (nry <= yspan_v); each
                # row past the first two runs under a pl.when, so positions
                # whose window needs fewer rows skip the whole gather+fma
                # pass. On the headline rotation rig 92-98% of positions
                # need only 2 of yspan 3 rows — a 31.7% row-pass upper
                # bound (scripts/kexp_rowskip_stats.py).
                #
                # pl.when carries no values, so the gated passes accumulate
                # through the wacc VMEM scratch: park the register sums,
                # accumulate under the scalar branch, read back. A vector-
                # valued lax.cond would keep everything in registers, but
                # its Mosaic lowering hangs >280 s at compile on this stack
                # (docs/ROUND4_NOTES.md; probe: scripts/kexp_cond_probe.py).
                nry_dyn = nry_ref[v, 0, 0, r, xb]
                for j in range(4):
                    wacc[j] = jnp.broadcast_to(w4[j], (8, TILE_W))
                for ry in range(2, n_static):
                    @pl.when(nry_dyn > ry)
                    def _(ry=ry):
                        yw = jnp.where(y0l == ry, wy0_r, 0.0) + jnp.where(
                            y0l == ry - 1, wy1_r, 0.0
                        )
                        for cg in range(2):
                            xlo, xhi = row_taps(cg, ry)
                            wacc[2 * cg] = wacc[2 * cg] + xlo * yw
                            wacc[2 * cg + 1] = wacc[2 * cg + 1] + xhi * yw
                w4 = tuple(wacc[j] for j in range(4))

            for cg in range(2):
                w_lo = jnp.broadcast_to(w4[2 * cg], (8, TILE_W))
                w_hi = jnp.broadcast_to(w4[2 * cg + 1], (8, TILE_W))
                acc_s[2 * cg] += w_lo
                acc_q[2 * cg] += w_lo * w_lo
                acc_s[2 * cg + 1] += w_hi
                acc_q[2 * cg + 1] += w_hi * w_hi
                if emit_warps:
                    # channel-row layout mirrors the variance output:
                    # lo half -> rows 0:16, hi half -> rows 16:32
                    warps_ref[v, 0, r, pl.ds(8 * cg, 8), :] = w_lo.astype(
                        warps_ref.dtype
                    )
                    warps_ref[v, 0, r, pl.ds(16 + 8 * cg, 8), :] = w_hi.astype(
                        warps_ref.dtype
                    )

        # variance = E[x^2] - E[x]^2; stream -> channel rows:
        # lo cg0 -> 0:8, lo cg1 -> 8:16, hi cg0 -> 16:24, hi cg1 -> 24:32
        for cg in range(2):
            for half, j in ((0, 2 * cg), (1, 2 * cg + 1)):
                mean = acc_s[j] * inv_v
                var = acc_q[j] * inv_v - mean * mean
                out_ref[0, r, pl.ds(16 * half + 8 * cg, 8), :] = var.astype(
                    out_ref.dtype
                )


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "yspan", "pr", "pcp", "out_dtype", "interpret",
        "emit_warps", "rowskip",
    ),
)
def sweep_variance_pallas(
    features: jnp.ndarray,      # [V, H, W, C=32], view 0 = reference
    proj_matrices: jnp.ndarray,  # [V, 4, 4]
    depth_values: jnp.ndarray,  # [D]
    height: int | None = None,
    width: int | None = None,
    yspan: int | tuple[int, ...] = YSPAN,
    pr: int = PR,
    pcp: int = PCP,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    emit_warps: bool = False,
    rowskip: bool = False,
):
    """Fused multi-view plane-sweep variance -> ([D, H, W, C], valid), or
    ([D, H, W, C], warps [Vs, D, H, W, C], valid) when ``emit_warps``.

    ``valid`` is a scalar bool; when False the result is undefined and the
    caller must use the XLA path (ops.plane_sweep.cost_volume_variance).
    Envelope kwargs come from suggest_envelope (static; one compile per
    envelope). ``yspan`` may be a per-view tuple (suggest_envelope's
    "yspan") — each source view then runs only its own tap-row count,
    which is the kernel's dominant cost (rigs whose views need unequal
    spans, e.g. ring rigs, save a full gather+fma pass per saved row).
    Features are consumed in bf16 (the model's fast path).

    ``emit_warps`` additionally writes each source view's warped volume
    (the per-view bilinear samples the variance accumulates) — the values
    already live in vector registers, so the only extra cost is the HBM
    write. Used by the paired training path (ops/paired_sweep.py), whose
    backward needs (w_v - mean) per view.

    ``rowskip`` gates every tap row past the first two behind a per-
    position scalar ``pl.when`` on the exact row count the plan computed
    (accumulating through a small VMEM scratch) — positions that need
    fewer rows than the static envelope skip the gather+fma pass
    entirely. Only pays when a view's yspan > 2 AND most positions need
    fewer rows (rotation rigs); structurally a no-op (and compiled
    without the gate or the nry plan input) when every yspan <= 2.
    """
    V, H, W, C = features.shape
    D = depth_values.shape[0]
    Vs = V - 1
    yspans = _yspans_tuple(yspan, Vs)
    # all-yspan<=2 rigs have no gateable rows: compile the plain kernel
    rowskip = bool(rowskip) and max(yspans) > 2
    nYB = -(-H // TILE_H)
    nXB = -(-W // TILE_W)
    Wp = -(-W // 2)
    Wpp = max(pcp, 128 * -(-Wp // 128))
    Hp = max(nYB * TILE_H, pr)

    ref_proj = proj_matrices[0]
    src_projs = proj_matrices[1:]
    plan = plan_sweep(
        src_projs, ref_proj, depth_values, H, W, yspan=yspans, pr=pr, pcp=pcp
    )
    rels = jax.vmap(lambda sp: _coord_terms(sp, ref_proj))(src_projs)
    rot = rels[0].reshape(Vs, 9).astype(jnp.float32)
    trans = rels[1].astype(jnp.float32)

    p0, p1 = jax.vmap(pack_features)(features[1:])  # [Vs, H, 16, Wp] x2
    pad = ((0, 0), (0, Hp - H), (0, 0), (0, Wpp - Wp))
    p0 = jnp.pad(p0, pad)
    p1 = jnp.pad(p1, pad)

    ref0, ref1 = pack_features(features[0])  # [H, 16, Wp]
    # re-interleave to packed [H, 16, W] then pad to the tile grid
    refp = jnp.stack([ref0, ref1], axis=-1).reshape(H, 16, 2 * Wp)[:, :, :W]
    refp = jnp.pad(refp, ((0, nYB * TILE_H - H), (0, 0), (0, nXB * TILE_W - W)))

    kernel = functools.partial(
        _sweep_kernel, Vs=Vs, V=V, H=H, W=W, nXB=nXB, yspans=yspans, pr=pr,
        pcp=pcp, emit_warps=emit_warps, rowskip=rowskip,
    )

    out_shapes = [
        jax.ShapeDtypeStruct((D, nYB * TILE_H, 32, nXB * TILE_W), out_dtype)
    ]
    out_specs = [
        pl.BlockSpec(
            (1, TILE_H, 32, TILE_W),
            lambda yb, xb, d, *refs: (d, yb, 0, xb),
            memory_space=pltpu.VMEM,
        )
    ]
    if emit_warps:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (Vs, D, nYB * TILE_H, 32, nXB * TILE_W), out_dtype
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (Vs, 1, TILE_H, 32, TILE_W),
                lambda yb, xb, d, *refs: (0, d, yb, 0, xb),
                memory_space=pltpu.VMEM,
            )
        )

    smem_plan_spec = pl.BlockSpec(
        (Vs, 1, 1, TILE_H, nXB),
        lambda yb, xb, d, *refs: (0, d, yb, 0, 0),
        memory_space=pltpu.SMEM,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # p0 stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),   # p1 stays in HBM
        pl.BlockSpec(
            (TILE_H, 16, TILE_W),
            lambda yb, xb, d, *refs: (yb, 0, xb),
            memory_space=pltpu.VMEM,
        ),
        smem_plan_spec,  # woy
        smem_plan_spec,  # base
    ]
    operands = [
        rot,
        trans,
        (1.0 / depth_values).astype(jnp.float32),
        plan.patch_y0,
        plan.patch_x0p,
        p0,
        p1,
        refp,
        plan.woy.astype(jnp.int32),
        plan.base.astype(jnp.int32),
    ]
    scratch_shapes = [
        pltpu.VMEM((Vs, pr, 16, pcp), jnp.float32),
        pltpu.VMEM((Vs, pr, 16, pcp), jnp.float32),
        pltpu.SemaphoreType.DMA((2 * Vs,)),
    ]
    if rowskip:
        # per-position tap-row counts + the gated-pass accumulator scratch
        in_specs.append(smem_plan_spec)  # nry
        operands.append(plan.nry.astype(jnp.int32))
        scratch_shapes.append(pltpu.VMEM((4, 8, TILE_W), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nYB, nXB, D),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(*operands)
    # [D, H, C, W] -> [D, H, W, C]
    var = jnp.transpose(out[0][:, :H, :, :W], (0, 1, 3, 2))
    if emit_warps:
        warps = jnp.transpose(out[1][:, :, :H, :, :W], (0, 1, 2, 4, 3))
        return var, warps, plan.valid
    return var, plan.valid
