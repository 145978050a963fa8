#!/usr/bin/env python
"""Probe: how many tap-row passes could a data-dependent row skip save?

The sweep kernel runs a STATIC per-view yspan of tap-row passes for every
(depth, row, x-block) position (ops/pallas/sweep_variance.py tap_loop);
each pass is a full gather+fma over both channel groups (+16.9 ms per
increment over 4 views at DTU-full). The envelope is the max local span
over the whole rig, but the LOCAL span at most positions can be smaller —
a per-position `pl.when` gate on the extra passes would skip the
difference at runtime.

This probe computes, entirely on host, the exact local span distribution
for the bench.py headline rotation rig and the BASELINE rig family:
fraction of (v, d, row, xb) positions needing k rows, and the implied
upper bound on saved row passes. Pure planning math (_corner_spans), no
kernel change — evidence for whether the branchy kernel variant is worth
its complexity.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import ring_projs  # noqa: E402  (headline rig construction)


def local_spans(src_proj, ref_proj, depth_values, H, W):
    """[D, H, nXB] local tap-row need (y_hi - y_lo + 2 clamped to >=2),
    same corner math as plan_sweep; positions whose window misses the
    image entirely count as 2 (the kernel still runs them)."""
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        _corner_spans,
    )

    x_lo, x_hi, y_lo, y_hi = jax.jit(
        lambda s, r, d: _corner_spans(s, r, d, H, W)
    )(jnp.asarray(src_proj), jnp.asarray(ref_proj), jnp.asarray(depth_values))
    need = np.asarray(y_hi) - np.asarray(y_lo) + 2
    inter = (
        (np.asarray(x_lo) < W) & (np.asarray(x_hi) > 0)
        & (np.asarray(y_lo) < H) & (np.asarray(y_hi) > 0)
    )
    return np.where(inter, np.clip(need, 2, None), 2)


def main():
    H, W, D = 864, 1152, 192
    h4, w4 = H // 4, W // 4
    # EXACTLY the bench.py headline rig: camera 0 of a 49-camera inward
    # ring + its 4 nearest neighbours, intrinsics at feature res
    K = np.array(
        [[W * 1.1, 0, W / 2], [0, W * 1.1, H / 2], [0, 0, 1]], np.float32
    )
    projs = ring_projs(49, [0, 1, 48, 2, 47], 150.0, -700.0, 700.0, K / 4.0)
    P0 = projs[0]
    depth_values = np.linspace(425, 905, D).astype(np.float32)

    total_rows = 0
    total_needed = 0.0
    for i, P in enumerate(projs[1:], start=1):
        spans = local_spans(P, P0, depth_values, h4, w4)
        env = int(spans.max())
        hist = {
            int(k): float((spans == k).mean()) for k in np.unique(spans)
        }
        # row passes actually needed vs env * positions
        needed = spans.mean()
        print(
            f"src view {i}: envelope yspan={env}, mean local span="
            f"{needed:.3f}, dist={hist}"
        )
        total_rows += env
        total_needed += needed
    print(
        f"\nstatic row passes/position: {total_rows}  "
        f"data-dependent lower bound: {total_needed:.2f}  "
        f"upper-bound saving: {100 * (1 - total_needed / total_rows):.1f}% "
        f"of sweep row passes"
    )


if __name__ == "__main__":
    main()
