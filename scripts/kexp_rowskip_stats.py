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
for the bench.py headline rotation rig (camera 0 of the 49-cam inward ring
+ its 4 nearest neighbours): fraction of (v, d, row, xb) positions needing
k rows, and the implied upper bound on saved row passes. Pure planning
math (_corner_spans), no kernel change — evidence for whether the branchy
kernel variant is worth its complexity. Per-view envelopes are asserted
equal to suggest_envelope()['yspan'] so the probe can't drift from the
kernel's real planning math.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import ring_projs  # noqa: E402  (headline rig construction)


def make_local_spans(H, W):
    """Build a jitted [D, H, nXB] local tap-row need probe: y_hi - y_lo + 1
    clamped to >=2 — the SAME row count suggest_envelope uses
    (sweep_variance.py:189) and plan_sweep gates on; positions whose window
    misses the image entirely count as 2 (the kernel still runs them).
    Jitted ONCE per (H, W) so per-view calls don't recompile."""
    import functools

    import jax

    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        _corner_spans,
    )

    spans_fn = jax.jit(functools.partial(_corner_spans, H=H, W=W))

    def local_spans(src_proj, ref_proj, depth_values):
        x_lo, x_hi, y_lo, y_hi = map(
            np.asarray, spans_fn(src_proj, ref_proj, depth_values)
        )
        need = y_hi - y_lo + 1
        inter = (x_lo < W) & (x_hi > 0) & (y_lo < H) & (y_hi > 0)
        return np.where(inter, np.clip(need, 2, None), 2)

    return local_spans


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

    # cross-check: the probe's per-view envelope must equal the planner's
    from scene_3dreconstruction_mvsnet_tpu.ops.pallas.sweep_variance import (
        suggest_envelope,
    )

    planner_yspans = suggest_envelope(
        np.stack(projs[1:]), P0, depth_values, h4, w4
    )["yspan"]

    local_spans = make_local_spans(h4, w4)
    total_rows = 0
    total_needed = 0.0
    for i, P in enumerate(projs[1:], start=1):
        spans = local_spans(P, P0, depth_values)
        env = int(spans.max())
        assert env == planner_yspans[i - 1], (
            f"probe envelope {env} != suggest_envelope "
            f"{planner_yspans[i - 1]} for src view {i}"
        )
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
