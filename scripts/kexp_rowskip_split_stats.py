"""Where do the >2-tap-row positions live? (CPU, no TPU needed.)

The pl.when rowskip kernel measured SLOWER (scripts/kexp_rowskip_ab.py:
89.1 vs 62.1 ms — Mosaic branch overhead at 32 branches/grid-step dwarfs
the saved gather passes). The remaining zero-branch alternative is STATIC
specialization: split a grid axis so most steps compile with yspan=2. This
script reports how plan.nry > 2 distributes over the depth / row-block /
x-block grid axes for the headline rotation rig, and the best depth split.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import ring_projs
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        plan_sweep,
        suggest_envelope,
    )

    H, W, D = 216, 288, 192
    IMG_H, IMG_W = 864, 1152
    K = np.array(
        [[IMG_W * 1.1, 0, IMG_W / 2], [0, IMG_W * 1.1, IMG_H / 2], [0, 0, 1]],
        np.float32,
    )
    projs = ring_projs(49, [0, 1, 48, 2, 47], 150.0, -700.0, 700.0, K / 4.0)
    dv = np.linspace(425, 905, D, dtype=np.float32)
    env = suggest_envelope(projs[1:], projs[0], dv, H, W)
    print("envelope:", env)

    plan = plan_sweep(
        jnp.asarray(projs[1:]), jnp.asarray(projs[0]), jnp.asarray(dv),
        H, W, **env,
    )
    nry = np.asarray(plan.nry)  # [Vs, D, nYB, TILE_H, nXB]
    Vs, Dp, nYB, TH, nXB = nry.shape
    need3 = nry > 2
    print(f"nry shape {nry.shape}; frac positions needing >2 rows: "
          f"{need3.mean():.4f} (per view: {need3.reshape(Vs, -1).mean(1)})")

    # by depth plane: a plane is 'cheap' if NO position of NO view needs >2
    by_d = need3.any(axis=(0, 2, 3, 4))  # [D]
    print(f"depth planes with any >2 need: {by_d.sum()}/{Dp}")
    if 0 < by_d.sum() < Dp:
        idx = np.where(by_d)[0]
        print(f"  those planes: contiguous [{idx.min()}, {idx.max()}], "
              f"count {len(idx)}")
    # per-view depth split (each view could get its own static span per
    # depth segment if we split the kernel's depth axis)
    for v in range(Vs):
        bd = need3[v].any(axis=(1, 2, 3))
        idx = np.where(bd)[0]
        rng = f"[{idx.min()},{idx.max()}]" if len(idx) else "-"
        print(f"  view {v}: {bd.sum()}/{Dp} planes need 3 rows {rng}")

    # by row block
    by_yb = need3.any(axis=(0, 1, 3, 4))
    print(f"row blocks with any >2 need: {by_yb.sum()}/{nYB} "
          f"({np.where(by_yb)[0].tolist()})")
    by_xb = need3.any(axis=(0, 1, 2, 3))
    print(f"x blocks with any >2 need: {by_xb.sum()}/{nXB} "
          f"({np.where(by_xb)[0].tolist()})")

    # best depth split into [0,k) + [k,D): cost model = row passes, where a
    # kernel's static yspan per view is the max need in its segment
    passes_full = need3.size // Dp * 0  # silence lints
    def seg_cost(lo, hi):
        if hi <= lo:
            return 0.0
        spans = np.clip(nry[:, lo:hi].reshape(Vs, -1).max(axis=1), 2, None)
        return float(spans.sum() * (hi - lo))  # rows x planes (per tile)

    base = seg_cost(0, Dp)
    best = (None, base)
    for k in range(1, Dp):
        c = seg_cost(0, k) + seg_cost(k, Dp)
        if c < best[1]:
            best = (k, c)
    print(f"single split: best k={best[0]} cost {best[1]:.0f} vs {base:.0f} "
          f"-> {1 - best[1] / base:.1%} row-pass saving")

    # two splits
    best2 = (None, None, best[1])
    for k1 in range(1, Dp - 1, 4):
        c1 = seg_cost(0, k1)
        for k2 in range(k1 + 1, Dp, 4):
            c = c1 + seg_cost(k1, k2) + seg_cost(k2, Dp)
            if c < best2[2]:
                best2 = (k1, k2, c)
    print(f"double split: k=({best2[0]},{best2[1]}) cost {best2[2]:.0f} "
          f"-> {1 - best2[2] / base:.1%} row-pass saving")


if __name__ == "__main__":
    main()
