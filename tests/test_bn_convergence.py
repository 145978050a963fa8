"""Quantify the documented BatchNorm deviation (COMPONENTS.md):

Our FeatureNet folds the V views into the batch axis, so train-mode BN
statistics pool across views; the reference calls FeatureNet per view
(/root/reference/models/mvsnet.py:125), computing BN batch stats per view.
Eval mode is unaffected (running stats). These tests train BOTH
implementations from identical weights on the identical batch sequence
(same Adam hyperparameters) and assert the loss trajectories track each
other — i.e. the pooled-view BN does not change convergence.

Two tiers:
  * test_bn_pooling_does_not_change_convergence — 8 steps at 64x96,
    asserts per-step relative loss delta (measured 0.3-1.2%).
  * test_bn_pooling_convergence_long — 200 steps at 48x64 on a repeating
    4-batch cycle (so the optimization actually converges rather than
    chasing fresh noise), asserts the FINAL loss plateau of the two
    trainers matches within a bounded relative delta and that both
    actually descended. This pins the deviation over a real optimization
    trajectory, not just the first few steps; see docs/ROUND3_NOTES.md
    for the recorded table.
"""

import numpy as np
import pytest


def _batches(n_steps, B, V, H, W, D, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([[W * 0.7, 0, W / 8], [0, W * 0.7, H / 8], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = -2.0 * v
        P = E.copy()
        P[:3, :4] = (K / 4.0) @ E[:3, :4]
        projs.append(P)
    proj = np.broadcast_to(np.stack(projs)[None], (B, V, 4, 4)).copy()
    dv = np.broadcast_to(
        np.linspace(425.0, 905.0, D, dtype=np.float32)[None], (B, D)
    ).copy()
    out = []
    for _ in range(n_steps):
        out.append(
            dict(
                imgs=rng.rand(B, V, H, W, 3).astype(np.float32),
                proj_matrices=proj,
                depth_values=dv,
                depth=rng.uniform(425, 905, (B, H // 4, W // 4)).astype(np.float32),
                mask=(rng.rand(B, H // 4, W // 4) > 0.3).astype(np.float32),
            )
        )
    return out


def _train_ours(batches, lr):
    """Our jitted Adam trainer from PRNGKey(3) init; returns (losses,
    variables) — variables are the INITIAL ones, for seeding the torch
    twin with identical weights."""
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train import (
        TrainState, make_optimizer, make_train_step,
    )

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(3),
        jnp.asarray(batches[0]["imgs"]),
        jnp.asarray(batches[0]["proj_matrices"]),
        jnp.asarray(batches[0]["depth_values"]),
    )
    state = TrainState.create(variables, make_optimizer(lambda s: lr))
    step = jax.jit(make_train_step(model))
    losses = []
    for b in batches:
        state, aux = step(state, {k: jnp.asarray(v) for k, v in b.items()})
        losses.append(float(aux["loss"]))
    return losses, variables


def _train_reference(batches, lr, variables):
    """The actual reference trainer (CPU torch) from the same weights."""
    import sys

    import torch

    from scene_3dreconstruction_mvsnet_tpu.interop import export_torch_state_dict

    # Import the reference model, then drop the path entry again: leaving
    # /root/reference at sys.path[0] makes a later `import evalDTU` in another
    # test resolve to the REFERENCE's evalDTU.py (which imports open3d) —
    # an ordering-dependent ModuleNotFoundError. The imported modules stay
    # cached in sys.modules, which is all this function needs.
    sys.path.insert(0, "/root/reference")
    try:
        from models.mvsnet import (  # noqa: E402
            MVSNet as TorchMVSNet,
            mvsnet_loss,
        )
    finally:
        sys.path.remove("/root/reference")

    tmodel = TorchMVSNet(refine=False)
    sd = {
        k[len("module."):]: torch.from_numpy(np.asarray(v))
        for k, v in export_torch_state_dict(variables).items()
    }
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("refine" in m for m in missing), missing
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr, betas=(0.9, 0.999))
    losses = []
    for b in batches:
        opt.zero_grad()
        imgs = torch.from_numpy(
            np.transpose(b["imgs"], (0, 1, 4, 2, 3))
        )  # torch is NCHW
        outputs = tmodel(
            imgs, torch.from_numpy(b["proj_matrices"]),
            torch.from_numpy(b["depth_values"]),
        )
        loss = mvsnet_loss(
            outputs["depth"], torch.from_numpy(b["depth"]),
            torch.from_numpy(b["mask"]),
        )
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


@pytest.mark.slow
def test_bn_pooling_does_not_change_convergence():
    B, V, H, W, D, steps, lr = 1, 3, 64, 96, 16, 8, 1e-3
    batches = _batches(steps, B, V, H, W, D)
    ours, variables = _train_ours(batches, lr)
    theirs = _train_reference(batches, lr, variables)

    rel = [abs(a - b) / max(abs(b), 1e-6) for a, b in zip(ours, theirs)]
    print("ours:  ", [f"{x:.4f}" for x in ours])
    print("theirs:", [f"{x:.4f}" for x in theirs])
    print("rel:   ", [f"{x:.4f}" for x in rel])
    # Even at step 0 (identical weights) losses differ slightly: train-mode
    # BN normalizes with batch statistics, and ours pool across the V views
    # folded into the batch while the reference normalizes per view.
    # Measured: 0.3-1.2% per-step relative delta over 8 steps — bounded.
    assert rel[0] < 0.02, rel
    assert max(rel) < 0.05, rel
    # Both must actually be learning. Per-step losses are noisy over an
    # 8-step window on random batches (the measured series ends higher than
    # it starts for BOTH trainers), so compare half-window means — the real
    # assertion of this test is the ours-vs-reference parity above.
    h = len(ours) // 2
    assert np.mean(ours[h:]) < np.mean(ours[:h]), ours
    assert np.mean(theirs[h:]) < np.mean(theirs[:h]), theirs


@pytest.mark.slow
def test_bn_pooling_convergence_long():
    """200 optimization steps over a repeating 4-batch cycle: the two
    trainers' loss plateaus must land together (VERDICT round-2 item 9)."""
    # H, W divisible by 32 and D by 8 (the 3D U-Net strides depth and the
    # feature-res spatial dims three times each)
    B, V, H, W, D, lr = 1, 3, 64, 64, 16, 1e-3
    cycle = _batches(4, B, V, H, W, D, seed=7)
    batches = [cycle[i % len(cycle)] for i in range(200)]
    ours, variables = _train_ours(batches, lr)
    theirs = _train_reference(batches, lr, variables)

    o0, t0 = np.mean(ours[:20]), np.mean(theirs[:20])
    o1, t1 = np.mean(ours[-30:]), np.mean(theirs[-30:])
    print(f"ours  first20={o0:.4f} last30={o1:.4f}")
    print(f"theirs first20={t0:.4f} last30={t1:.4f}")
    # both trainers must have genuinely descended on the fixed cycle
    assert o1 < 0.5 * o0, (o0, o1)
    assert t1 < 0.5 * t0, (t0, t1)
    # and the final plateaus must match within a bounded relative delta:
    # the pooled-view BN statistics do not change where training converges
    assert abs(o1 - t1) / max(t1, 1e-6) < 0.15, (o1, t1)
