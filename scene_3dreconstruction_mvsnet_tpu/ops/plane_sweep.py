"""Streaming plane-sweep cost-volume construction.

The variance cost volume Var = E[x^2] - E[x]^2 over views is an *additive*
reduction: the running sum and sum-of-squares are accumulated one warped view
at a time, so only a single [B, D, H, W, C] warped volume is ever live —
the TPU-native version of the reference's in-place accumulation trick
(/root/reference/models/mvsnet.py:145-177). Views are streamed with
``lax.scan``; depth planes can additionally be chunked (each chunk's sweep is
independent) to bound HBM at large eval resolutions, where the full volume is
~2.9 GB in f32 (SURVEY.md §3.3 memory note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import warp_src_feature


def _sweep_variance_chunk(
    features: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    depth_chunk: jnp.ndarray,
    align_corners: bool,
    grad_env: tuple[int, int, int, int] | None = None,
) -> jnp.ndarray:
    """Variance volume for one chunk of depth planes.

    features: [B, V, H, W, C] (view 0 = reference), proj: [B, V, 4, 4],
    depth_chunk: [B, Dc] -> [B, Dc, H, W, C].

    grad_env: (kx, yspan, pr, pcp) — route the warp through the custom-VJP
    wrapper whose backward is the inverse-warp Pallas kernel
    (ops/pallas/warp_grad.py) instead of XLA's scatter-add transpose.
    Requires align_corners=False (the kernel evaluates the reference's
    sampling composition).
    """
    B, V, H, W, C = features.shape
    Dc = depth_chunk.shape[1]
    acc_dtype = jnp.float32  # accumulate sum/sum^2 in f32 even for bf16 warps

    warp = warp_src_feature
    if grad_env is not None and not align_corners:
        from .pallas.warp_grad import make_warp_with_pallas_grad

        pallas_warp = make_warp_with_pallas_grad(
            *grad_env, interpret=jax.default_backend() != "tpu"
        )
        warp = lambda f, sp, rp, dv, align_corners=False: pallas_warp(f, sp, rp, dv)

    ref_fea = features[:, 0]
    ref_proj = proj_matrices[:, 0]

    # Reference view enters the accumulators unwarped, broadcast over depth
    # (/root/reference/models/mvsnet.py:145-147).
    ref_volume = jnp.broadcast_to(
        ref_fea[:, None].astype(acc_dtype), (B, Dc, H, W, C)
    )
    init = (ref_volume, ref_volume * ref_volume)

    src_feas = jnp.moveaxis(features[:, 1:], 1, 0)  # [V-1, B, H, W, C]
    src_projs = jnp.moveaxis(proj_matrices[:, 1:], 1, 0)  # [V-1, B, 4, 4]

    def body(carry, xs):
        vol_sum, vol_sq = carry
        src_fea, src_proj = xs
        warped = warp(
            src_fea, src_proj, ref_proj, depth_chunk, align_corners=align_corners
        ).astype(acc_dtype)
        return (vol_sum + warped, vol_sq + warped * warped), None

    (vol_sum, vol_sq), _ = jax.lax.scan(body, init, (src_feas, src_projs))
    inv_v = jnp.asarray(1.0 / V, dtype=acc_dtype)
    mean = vol_sum * inv_v
    return (vol_sq * inv_v - mean * mean).astype(features.dtype)


def cost_volume_variance(
    features: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    depth_values: jnp.ndarray,
    depth_chunk: int | None = None,
    align_corners: bool = False,
    pallas_env: tuple[int, int, int] | None = None,
    grad_env: tuple[int, int, int, int] | None = None,
) -> jnp.ndarray:
    """Variance cost volume over views.

    Args:
      features: [B, V, H, W, C] per-view feature maps; view 0 is the
        reference view.
      proj_matrices: [B, V, 4, 4] K@E per view.
      depth_values: [B, D] depth hypotheses.
      depth_chunk: if set (must divide D), sweep depth planes in chunks of
        this size via ``lax.scan`` to bound peak HBM; None sweeps all planes
        at once.
      align_corners: sampler convention, see ops.sampling.
      pallas_env: (yspan, pr, pcp) static window envelope — dispatch the
        fused Pallas sweep-variance TPU kernel (ops/pallas/sweep_variance.py)
        with a traced-validity fallback to the XLA path. Only taken on the
        reference's sampler convention (align_corners=False) and C=32
        features; B > 1 runs per-sample launches inside lax.map. Get the
        envelope from ops.pallas.sweep_variance.suggest_envelope.
      grad_env: (kx, yspan, pr, pcp) — route the warp through the custom-VJP
        wrapper (backward = inverse-warp Pallas kernel, no scatter-add).
        Get it from ops.pallas.warp_grad.suggest_grad_envelope; size it over
        the whole rig family with margin — the backward does not fall back
        (see make_warp_with_pallas_grad).

    Returns: [B, D, H, W, C] variance volume.
    """
    B, V, H, W, C = features.shape
    D = depth_values.shape[1]

    # dtype gate: the kernel packs features as bf16 pairs, so dispatching an
    # f32 input would silently degrade precision — only take the kernel when
    # the caller already computes in bf16 (the fast path)
    if (
        pallas_env is not None
        and C == 32
        and not align_corners
        and features.dtype == jnp.bfloat16
    ):
        from .pallas.sweep_variance import plan_is_valid, sweep_variance_pallas

        yspan, pr, pcp = pallas_env
        env = dict(yspan=yspan, pr=pr, pcp=pcp)

        def one(feats, projs, dv):
            # unbatched [V,H,W,C] sample: per-sample traced validity with an
            # in-graph XLA fallback (only one branch executes on TPU)
            valid = plan_is_valid(projs[1:], projs[0], dv, H, W, **env)

            def pallas_branch(f, p, d):
                out, _ = sweep_variance_pallas(
                    f, p, d, out_dtype=f.dtype,
                    # Mosaic only lowers on TPU; interpret elsewhere (CPU)
                    interpret=jax.default_backend() != "tpu",
                    **env,
                )
                return out

            def xla_branch(f, p, d):
                return cost_volume_variance(
                    f[None], p[None], d[None], depth_chunk=depth_chunk,
                    align_corners=align_corners,
                )[0]

            return jax.lax.cond(valid, pallas_branch, xla_branch, feats, projs, dv)

        if B == 1:
            return one(features[0], proj_matrices[0], depth_values[0])[None]
        # batched serving: sequential single-sample kernel launches inside
        # one jit (device-side queue; the kernel grid is already big enough
        # to saturate the chip per sample)
        return jax.lax.map(
            lambda t: one(*t), (features, proj_matrices, depth_values)
        )

    if depth_chunk is None or depth_chunk >= D:
        return _sweep_variance_chunk(
            features, proj_matrices, depth_values, align_corners, grad_env
        )

    if D % depth_chunk != 0:
        raise ValueError(f"depth_chunk {depth_chunk} must divide D={D}")
    n_chunks = D // depth_chunk
    chunks = depth_values.reshape(B, n_chunks, depth_chunk)
    chunks = jnp.moveaxis(chunks, 1, 0)  # [n_chunks, B, Dc]

    def body(_, depth_c):
        out = _sweep_variance_chunk(
            features, proj_matrices, depth_c, align_corners, grad_env
        )
        return None, out

    _, vols = jax.lax.scan(body, None, chunks)  # [n_chunks, B, Dc, H, W, C]
    return jnp.moveaxis(vols, 0, 1).reshape(B, D, H, W, C)
