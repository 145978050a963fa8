"""Headless debug-visualization system (SURVEY.md component 33).

The reference gates cv2.imshow / Open3D windows on three bitmask flag
families (--debug_MVSnet 6 bits, --debug_depth_gen, --debug_depth_filter;
/root/reference/models/mvsnet.py:112-232, eval.py:61-74). TPU runs are
headless, so each bit instead dumps PNG image grids into
``<outdir>/debug/``. Bit meanings match the reference:

--debug_MVSnet:  bit 0 input images + feature channels, bit 1 warped views,
                 bit 2 regularized cost slices, bit 3 probability slices,
                 bit 4 depth expectation, bit 5 photometric confidence.
"""

from __future__ import annotations

import os

import numpy as np

from .misc import get_powers
from ..io.images import save_image_u8


def _norm01(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    lo, hi = np.min(x), np.max(x)
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def _save(outdir: str, name: str, img: np.ndarray) -> None:
    os.makedirs(outdir, exist_ok=True)
    save_image_u8(os.path.join(outdir, name), _norm01(img))


def debug_forward(
    model,
    variables: dict,
    imgs,
    proj_matrices,
    depth_values,
    bitmask: int,
    outdir: str,
) -> None:
    """Run MVSNet stage by stage and dump the stages selected by ``bitmask``.

    imgs [B,V,H,W,3], proj [B,V,4,4], depth_values [B,D] (first batch element
    is dumped). Runs each stage as its own jitted call, so this is for
    debugging, not the hot path.
    """
    import jax
    import jax.numpy as jnp

    from ..models.feature_net import FeatureNet
    from ..models.cost_reg_net import CostRegNet
    from ..ops import cost_volume_variance, warp_src_feature
    from ..ops.regression import depth_regression, photometric_confidence

    bits = set(get_powers(bitmask))
    if not bits:
        return
    dump_dir = os.path.join(outdir, "debug")
    imgs = jnp.asarray(imgs)
    proj_matrices = jnp.asarray(proj_matrices)
    depth_values = jnp.asarray(depth_values)
    B, V, H, W, C = imgs.shape

    fnet = FeatureNet(dtype=model.dtype)
    fvars = {
        "params": variables["params"]["feature"],
        "batch_stats": variables["batch_stats"]["feature"],
    }
    feats = jax.jit(lambda v, x: fnet.apply(v, x, train=False))(
        fvars, imgs.reshape(B * V, H, W, C)
    )
    feats = feats.reshape(B, V, H // 4, W // 4, -1)

    if "0" in bits:
        for v in range(V):
            _save(dump_dir, f"img_view{v}.png", np.asarray(imgs)[0, v])
            fea = np.asarray(feats)[0, v]
            for ch in range(0, fea.shape[-1], 4):
                _save(dump_dir, f"feat_view{v}_ch{ch}.png", fea[..., ch])

    if "1" in bits:
        warp = jax.jit(
            lambda f, s, r, d: warp_src_feature(f, s, r, d, align_corners=model.align_corners)
        )
        for v in range(1, V):
            w = np.asarray(
                warp(feats[:, v], proj_matrices[:, v], proj_matrices[:, 0], depth_values)
            )[0]
            D = w.shape[0]
            for d in range(0, D, max(D // 4, 1)):
                for ch in range(0, w.shape[-1], 8):
                    _save(dump_dir, f"warped_v{v}_d{d}_ch{ch}.png", w[d, ..., ch])

    volume = jax.jit(lambda f, p, d: cost_volume_variance(f, p, d))(
        feats, proj_matrices, depth_values
    )
    cnet = CostRegNet(dtype=model.dtype)
    cvars = {
        "params": variables["params"]["cost_regularization"],
        "batch_stats": variables["batch_stats"]["cost_regularization"],
    }
    cost_reg = jax.jit(lambda v, x: cnet.apply(v, x, train=False))(cvars, volume)[..., 0]

    if "2" in bits:
        cr = np.asarray(cost_reg)[0]
        for d in range(0, cr.shape[0], max(cr.shape[0] // 8, 1)):
            _save(dump_dir, f"costreg_d{d}.png", cr[d])

    prob = jax.jit(lambda c: jax.nn.softmax(c, axis=1))(cost_reg)
    if "3" in bits:
        p = np.asarray(prob)[0]
        for d in range(0, p.shape[0], max(p.shape[0] // 8, 1)):
            _save(dump_dir, f"prob_d{d}.png", p[d])

    depth = jax.jit(depth_regression)(prob, depth_values)
    if "4" in bits:
        _save(dump_dir, "depth_expectation.png", np.asarray(depth)[0])

    if "5" in bits:
        conf = np.asarray(jax.jit(photometric_confidence)(prob))[0]
        _save(dump_dir, "photometric_confidence.png", conf)
        for pct in (0.1, 0.25, 0.5, 0.75, 0.9):
            _save(dump_dir, f"photo_conf_gt{int(pct * 100)}.png", conf * (conf > pct))

    print(f"[debug_dump] wrote stage dumps for bits {sorted(bits)} to {dump_dir}")
