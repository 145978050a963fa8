"""MVSNet: end-to-end multi-view-stereo depth network, assembled TPU-first.

Pipeline parity with /root/reference/models/mvsnet.py:91-239:
  1. per-view 2D feature extraction (views folded into the batch axis — one
     big NHWC conv stack on the MXU instead of the reference's per-view
     Python loop),
  2. differentiable homography plane sweep -> variance cost volume, streamed
     over views with lax.scan (ops/plane_sweep.py) so a single warped volume
     is live at a time,
  3. 3D U-Net regularization (CostRegNet, NDHWC),
  4. fused softmax depth regression + windowed photometric confidence
     (ops/regression.py; Pallas kernel on TPU),
  5. optional residual refinement (RefineNet; fixed versus the reference's
     broken dead code, default off).

Inputs are channels-last: imgs [B, V, H, W, 3] (view 0 = reference view),
proj_matrices [B, V, 4, 4] (K@E at feature resolution, i.e. intrinsics/4),
depth_values [B, D].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.plane_sweep import cost_volume_variance
from ..ops.regression import regress_depth_and_confidence
from .cost_reg_net import CostRegNet
from .feature_net import FeatureNet
from .refine_net import RefineNet


class MVSNet(nn.Module):
    """Flax MVSNet.

    Attributes:
      refine: enable the RefineNet residual head (reference default False;
        its shipped configs never enable it).
      depth_chunk: optional chunk size for the plane sweep depth axis to
        bound peak HBM at large eval resolutions (None = all planes at once).
      use_pallas_regression: dispatch the fused Pallas TPU kernel for
        softmax regression + confidence instead of the XLA composite.
      flat_features: run FeatureNet in the flat block-Toeplitz layout
        (ops/flat_conv.py) — dense 128-channel convs with no tile-padding
        tax, ~2x on TPU. Same parameter tree; exact up to contraction
        order (works in train and eval, differentiable).
      pallas_sweep_env: (yspan, pr, pcp) static window envelope — dispatch
        the fused Pallas plane-sweep variance kernel
        (ops/pallas/sweep_variance.py) on the bf16 path. ``yspan`` may be a
        per-view tuple (suggest_envelope's "yspan"): each source view then
        runs only its own tap-row count, the kernel's dominant cost. At
        eval this has a traced-validity fallback to the XLA sweep for rigs
        that exceed the envelope. Get it from
        ops.pallas.sweep_variance.suggest_envelope (or
        ops.paired_sweep.suggest_family_envelopes for a rig family).
      pallas_grad_env: (kx, yspan, pr, pcp) — in training, route the warp's
        BACKWARD through the inverse-warp Pallas kernel
        (ops/pallas/warp_grad.py) instead of XLA's scatter-add transpose.
        When BOTH envelopes are set (and dtype is bf16), training uses the
        fully paired custom_vjp (ops/paired_sweep.py): fused Pallas sweep
        forward + inverse-warp Pallas backward, with the plan validity
        surfaced as the ``plan_valid`` output for the Trainer to check
        (neither kernel falls back inside the VJP). With only
        pallas_grad_env set, training keeps the XLA sweep forward and swaps
        in the Pallas backward per warp. Size envelopes over the rig family
        (ops.paired_sweep.suggest_family_envelopes).
      dtype: computation dtype for the conv stacks (bf16 = TPU fast path;
        None = f32 for bit-parity eval). Params are always f32.
      align_corners: sampler convention; False matches the reference under
        PyTorch 2.x (see ops/sampling.py).
      volume_sharding: optional jax.sharding.NamedSharding applied to the
        cost volume ([B, D, H, W, C]) with with_sharding_constraint —
        typically P('data', 'sweep') so depth hypotheses shard across chips
        and GSPMD inserts the U-Net's halo exchanges (parallel/sharding.py).
      remat: rematerialize the plane sweep in the backward pass (training
        memory saver; required for the full 512x640/D192 recipe on 16 GB).
    """

    refine: bool = False
    depth_chunk: Optional[int] = None
    use_pallas_regression: bool = False
    flat_features: bool = False
    flat_costreg: bool = False
    # eval-only fused Pallas conv0 (streams the cost volume from HBM once;
    # ops/pallas/conv0_fused.py); requires flat_costreg and dtype=bf16
    pallas_conv0: bool = False
    # (yspan | per-view yspans tuple, pr, pcp)
    pallas_sweep_env: Optional[tuple] = None
    pallas_grad_env: Optional[tuple[int, int, int, int]] = None
    dtype: Any = None
    align_corners: bool = False
    volume_sharding: Any = None
    remat: bool = False

    def setup(self):
        # flat=True runs the extractor in the block-Toeplitz layout
        # (ops/flat_conv.py — ~2x on TPU, identical param tree)
        self.feature = FeatureNet(dtype=self.dtype, flat=self.flat_features)
        # static_argnums=(2,): (self, x, train) — train flips the BN branch
        cost_reg_cls = (
            nn.remat(CostRegNet, static_argnums=(2,)) if self.remat else CostRegNet
        )
        self.cost_regularization = cost_reg_cls(
            dtype=self.dtype, flat=self.flat_costreg,
            pallas_conv0=self.pallas_conv0 and self.flat_costreg,
        )
        if self.refine:
            self.refine_network = RefineNet(dtype=self.dtype)

    def __call__(
        self,
        imgs: jnp.ndarray,
        proj_matrices: jnp.ndarray,
        depth_values: jnp.ndarray,
        train: bool = False,
    ) -> dict[str, jnp.ndarray]:
        B, V, H, W, C = imgs.shape
        if proj_matrices.shape[1] != V:
            raise ValueError(
                f"got {V} images but {proj_matrices.shape[1]} projection matrices"
            )

        # Step 1: feature extraction, views folded into batch.
        feats = self.feature(imgs.reshape(B * V, H, W, C), train=train)
        feats = feats.reshape(B, V, H // 4, W // 4, feats.shape[-1])

        # Step 2: plane-sweep variance cost volume [B, D, H/4, W/4, 32].
        # Features warp in the compute dtype (bf16 on the fast path, which
        # halves the dominant HBM traffic); the sum/sum^2 accumulators and
        # the variance subtraction stay f32 inside cost_volume_variance.
        sweep_dtype = self.dtype or jnp.float32
        # the fused Pallas sweep packs features as bf16 pairs, so it is only
        # a faithful drop-in on the bf16 fast path
        use_pallas_sweep = (
            self.pallas_sweep_env is not None
            and sweep_dtype == jnp.bfloat16
            and not self.align_corners
        )
        plan_valid = None
        if train and use_pallas_sweep and self.pallas_grad_env is not None:
            # paired training path: fused Pallas variance forward + inverse-
            # warp Pallas backward in one custom_vjp (ops/paired_sweep.py).
            # No fallback inside the VJP — plan_valid is surfaced as an aux
            # output and checked every step by the Trainer.
            from ..ops.paired_sweep import make_paired_cost_volume

            paired = make_paired_cost_volume(
                *self.pallas_sweep_env, *self.pallas_grad_env,
                interpret=jax.default_backend() != "tpu",
            )
            volume, plan_valid = paired(
                feats.astype(jnp.bfloat16),
                proj_matrices.astype(jnp.float32),
                depth_values.astype(jnp.float32),
            )
        else:
            sweep_env = (
                self.pallas_sweep_env
                if (use_pallas_sweep and not train)
                else None
            )
            sweep = lambda f, p, d: cost_volume_variance(
                f, p, d, depth_chunk=self.depth_chunk,
                align_corners=self.align_corners, pallas_env=sweep_env,
                grad_env=self.pallas_grad_env if train else None,
            )
            if self.remat:
                # recompute the sweep in the backward pass instead of storing
                # the warped footprints (saves several GB at training shapes)
                sweep = jax.checkpoint(sweep)
            volume = sweep(
                feats.astype(sweep_dtype),
                proj_matrices.astype(jnp.float32),
                depth_values.astype(jnp.float32),
            )
        if self.dtype is not None:
            volume = volume.astype(self.dtype)
        if self.volume_sharding is not None:
            volume = jax.lax.with_sharding_constraint(volume, self.volume_sharding)

        # Step 3: 3D U-Net regularization -> [B, D, h, w].
        # train passed positionally: nn.remat static_argnums only covers
        # positional args
        cost_reg = self.cost_regularization(volume, train)[..., 0]

        # Step 4: softmax regression + confidence (f32 for a stable softmax).
        # The fused Pallas kernel is inference-only (no VJP registered);
        # training always takes the differentiable XLA composite.
        depth, confidence = regress_depth_and_confidence(
            cost_reg.astype(jnp.float32),
            depth_values.astype(jnp.float32),
            use_pallas=self.use_pallas_regression and not train,
        )

        outputs = {"depth": depth, "photometric_confidence": confidence}
        if plan_valid is not None:
            outputs["plan_valid"] = plan_valid
        if self.refine:
            outputs["refined_depth"] = self.refine_network(
                imgs[:, 0], depth, train=train
            )
        return outputs


def mvsnet_loss(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked smooth-L1 (Huber, beta=1) loss, mean over valid pixels —
    matches F.smooth_l1_loss over mask>0.5 (/root/reference/models/mvsnet.py:242-244)."""
    valid = (mask > 0.5).astype(depth_est.dtype)
    diff = jnp.abs(depth_est - depth_gt)
    per_pixel = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    total = jnp.sum(per_pixel * valid)
    count = jnp.maximum(jnp.sum(valid), 1.0)
    return total / count
