"""Paired plane-sweep cost volume: fused Pallas variance FORWARD + inverse-
warp Pallas BACKWARD in one ``jax.custom_vjp`` — the training-path sweep.

This is the op the reference computes with homo_warping + in-place sum/sum^2
accumulation inside autograd (/root/reference/models/mvsnet.py:145-177 and
models/module.py:96-139); here both directions are hand-lowered TPU kernels:

  forward:  ops/pallas/sweep_variance.py with ``emit_warps=True`` — one
            kernel emits the variance volume AND each source view's warped
            volume (already in vector registers; only the HBM write is
            extra). No per-view XLA gather pass, no sum/sum^2 HBM traffic.
  backward: the variance's VJP w.r.t. view v's warped values is
            (2/V) * (w_v - mean) * g, an elementwise volume XLA fuses; the
            warp's transpose of that cotangent runs the inverse-warp gather
            kernel (ops/pallas/warp_grad.py) instead of XLA's scatter-add.
            The reference-view gradient is the direct elementwise reduction
            sum_d (2/V) * (ref - mean) * g.

Gradients flow to the feature values only — sweep coordinates are constants,
matching the reference's no_grad grid and the XLA path.

Neither kernel falls back inside the VJP (a lax.cond over the scatter-add
transpose would compile the round-1 minutes-long backward into every train
step). Instead the primal RETURNS a ``valid`` scalar — the AND of the sweep
plan's and every per-view grad plan's traced validity — which the train step
surfaces as the ``plan_valid`` aux metric and the Trainer checks every step
(loud error, never silent corruption). Size envelopes over the whole rig
family with suggest_family_envelopes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .pallas.sweep_variance import (
    merge_envelopes,
    suggest_envelope,
    sweep_variance_pallas,
)
from .pallas.warp_grad import plan_grad, suggest_grad_envelope, warp_grad_pallas


@functools.lru_cache(maxsize=None)
def make_paired_cost_volume(
    yspan: int,
    pr: int,
    pcp: int,
    kx: int,
    g_yspan: int,
    g_pr: int,
    g_pcp: int,
    interpret: bool = False,
):
    """Build (features [B,V,H,W,C=32] bf16, proj [B,V,4,4], depth [B,D])
    -> (variance volume [B,D,H,W,C] bf16, valid scalar bool).

    The first three kwargs are the sweep envelope (suggest_envelope), the
    next four the grad envelope (suggest_grad_envelope); one compile per
    envelope pair (lru_cache keeps the custom_vjp identity stable so jit
    caches hit across steps).
    """
    sweep_env = dict(yspan=yspan, pr=pr, pcp=pcp)
    grad_env = dict(kx=kx, yspan=g_yspan, pr=g_pr, pcp=g_pcp)

    def _fwd_one(features, proj, depth):
        V, H, W, _C = features.shape
        var, warps, sweep_valid = sweep_variance_pallas(
            features, proj, depth, emit_warps=True, interpret=interpret,
            **sweep_env,
        )
        g_valid = jax.vmap(
            lambda sp: plan_grad(sp, proj[0], depth, H, W, **grad_env).valid
        )(proj[1:])
        return var, warps, sweep_valid & jnp.all(g_valid)

    def _batched_fwd(features, proj, depth):
        if features.shape[0] == 1:  # B==1: skip the scan wrapper entirely
            vol, warps, valid = _fwd_one(features[0], proj[0], depth[0])
            return vol[None], warps[None], valid
        vols, warps, valids = lax.map(
            lambda t: _fwd_one(*t), (features, proj, depth)
        )
        return vols, warps, jnp.all(valids)

    @jax.custom_vjp
    def paired(features, proj_matrices, depth_values):
        vols, _, valid = _batched_fwd(features, proj_matrices, depth_values)
        return vols, valid

    def fwd(features, proj_matrices, depth_values):
        vols, warps, valid = _batched_fwd(features, proj_matrices, depth_values)
        return (vols, valid), (warps, features, proj_matrices, depth_values)

    def bwd(res, cots):
        g_vol, _g_valid = cots  # [B, D, H, W, C]; valid is non-differentiable
        warps, features, proj, depth = res
        V = features.shape[1]
        Vs = V - 1
        coeff = jnp.float32(2.0 / V)

        def one(t):
            g, w, f, p, dv = t  # [D,H,W,C], [Vs,D,H,W,C], [V,H,W,C], [V,4,4], [D]
            ref = f[0].astype(jnp.float32)
            wf = w.astype(jnp.float32)
            g32 = g.astype(jnp.float32) * coeff
            mean = (ref[None] + wf.sum(0)) * jnp.float32(1.0 / V)
            dref = jnp.sum(g32 * (ref[None] - mean), axis=0)  # [H,W,C]
            dsrcs = []
            for v in range(Vs):
                t_v = g32 * (wf[v] - mean)
                dsrc, _pv = warp_grad_pallas(
                    t_v, p[v + 1], p[0], dv, interpret=interpret, **grad_env
                )
                dsrcs.append(dsrc)
            return jnp.stack([dref] + dsrcs, 0)  # [V, H, W, C]

        if features.shape[0] == 1:
            dfeat = one((g_vol[0], warps[0], features[0], proj[0], depth[0]))[None]
        else:
            dfeat = lax.map(one, (g_vol, warps, features, proj, depth))
        return (dfeat.astype(features.dtype), None, None)

    paired.defvjp(fwd, bwd)
    return paired


def suggest_family_envelopes(samples, height, width, *,
                             sweep_margin=(2, 8, 0), grad_margin=(2, 4, 8, 0)):
    """Host-side: merged (sweep_env, grad_env) tuples covering a FAMILY of
    rigs, for MVSNet(pallas_sweep_env=..., pallas_grad_env=...).

    Args:
      samples: iterable of (proj_matrices [V,4,4], depth_values [D]) — e.g.
        several training samples spread across the dataset. Envelopes are
        the per-field max over the family.
      height, width: feature-map dims (image dims // 4).
      sweep_margin: added to (yspan, pr, pcp); pr is re-rounded to 8.
      grad_margin: added to (kx, yspan, pr, pcp); kx re-rounded to even,
        pr to 8.

    Returns (sweep_env, grad_env) static tuples. The margins absorb family
    members the planner did not see; the paired op still validity-checks
    every batch in-graph (train aux ``plan_valid``).
    """
    s_acc, g_acc = {}, {}
    n = 0
    for proj, depth in samples:
        proj = np.asarray(proj, np.float32)
        depth = np.asarray(depth, np.float32)
        s = suggest_envelope(proj[1:], proj[0], depth, height, width)
        g = suggest_grad_envelope(proj[1:], proj[0], depth, height, width)
        s_acc = merge_envelopes(s_acc, s)
        for k, v in g.items():
            g_acc[k] = max(g_acc.get(k, 0), v)
        n += 1
    if n == 0:
        raise ValueError("suggest_family_envelopes needs at least one sample")
    sm_y, sm_pr, sm_pcp = sweep_margin
    gm_kx, gm_y, gm_pr, gm_pcp = grad_margin
    sweep_env = (
        # per-view tap spans (slot-wise family max + margin): each saved
        # row is a full gather+fma pass in the sweep kernel
        tuple(y + sm_y for y in s_acc["yspan"]),
        -(-(s_acc["pr"] + sm_pr) // 8) * 8,
        s_acc["pcp"] + sm_pcp,
    )
    kx = g_acc["kx"] + gm_kx
    grad_env = (
        kx + (kx % 2),
        g_acc["yspan"] + gm_y,
        -(-(g_acc["pr"] + gm_pr) // 8) * 8,
        g_acc["pcp"] + gm_pcp,
    )
    return sweep_env, grad_env
