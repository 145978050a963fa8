"""Training / testing / profiling drivers.

Mirrors the reference's epoch structure (/root/reference/train.py:157-238):
per-batch jitted train step with periodic scalar+image summaries, a
checkpoint every ``save_freq`` epochs, and a full test pass per epoch
aggregated with DictAverageMeter. The profile mode wraps warmed-up eval
steps in ``jax.profiler.trace`` (Perfetto/TensorBoard), the TPU equivalent
of the reference's chrome-trace export (/root/reference/train.py:361-389).
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import numpy as np

from ..data.pipeline import BackgroundLoader, Loader, pack_u8_imgs
from ..utils.misc import DictAverageMeter
from .checkpoint import find_latest, restore_checkpoint, save_checkpoint
from .logging import SummaryLogger
from .lr import multistep_lr
from .state import TrainState, make_eval_step, make_optimizer, make_train_step


_SCALAR_KEYS = (
    "loss",
    "abs_depth_error",
    "thres1mm_error",
    "thres2mm_error",
    "thres4mm_error",
    "thres8mm_error",
)


def _scalars(aux: dict) -> dict[str, float]:
    return {k: float(aux[k]) for k in _SCALAR_KEYS if k in aux}


def _images(aux: dict, batch: dict) -> dict[str, Any]:
    depth_est = np.asarray(aux["depth_est"])
    mask = np.asarray(batch["mask"])
    ref_img = np.asarray(batch["imgs"])[:, 0]
    if ref_img.dtype == np.uint8:  # u8 transfer packing (pack_u8_imgs)
        ref_img = ref_img.astype(np.float32) / 255.0
    out = {
        "depth_est": depth_est * mask,
        "depth_gt": np.asarray(batch["depth"]),
        "ref_img": ref_img,
        "mask": mask,
        "errormap": np.abs(depth_est - np.asarray(batch["depth"])) * mask,
        "photo_conf": np.asarray(aux["photometric_confidence"]),
    }
    return out


class Trainer:
    """Owns model/state/loaders and runs the epoch loop."""

    def __init__(
        self,
        model,
        train_dataset,
        test_dataset,
        *,
        logdir: str,
        epochs: int = 16,
        lr: float = 1e-3,
        lrepochs: str = "10,12,14:2",
        weight_decay: float = 0.0,
        batch_size: int = 1,
        summary_freq: int = 100,
        save_freq: int = 1,
        seed: int = 1,
        num_workers: int = 4,
        plan_check: str = "raise",
        debug_mvsnet: int = 0,
    ) -> None:
        self.model = model
        self.logdir = logdir
        self.epochs = epochs
        self.summary_freq = summary_freq
        self.save_freq = save_freq
        # --debug_MVSnet bitmask: the reference drives cv2 windows from the
        # training forward (/root/reference/train.py:57-64); headless here,
        # each summary-freq step dumps the selected stages as PNGs under
        # <logdir>/debug_train/step<N>/debug/ (utils/debug_dump.py)
        self.debug_mvsnet = int(debug_mvsnet)
        if plan_check not in ("raise", "warn", "off"):
            raise ValueError(f"plan_check must be raise/warn/off, got {plan_check}")
        self.plan_check = plan_check
        os.makedirs(logdir, exist_ok=True)

        self.train_loader = Loader(
            train_dataset, batch_size, shuffle=True, drop_last=True,
            num_workers=num_workers, seed=seed,
        )
        self.test_loader = Loader(
            test_dataset, batch_size, shuffle=False, drop_last=False,
            num_workers=num_workers,
        )

        steps_per_epoch = max(len(self.train_loader), 1)
        schedule = multistep_lr(lr, lrepochs, steps_per_epoch)
        tx = make_optimizer(schedule, weight_decay)
        self.schedule = schedule

        sample = train_dataset[0]
        import jax.numpy as jnp

        variables = model.init(
            jax.random.PRNGKey(seed),
            jnp.asarray(sample["imgs"][None]),
            jnp.asarray(sample["proj_matrices"][None]),
            jnp.asarray(sample["depth_values"][None]),
        )
        self.state = TrainState.create(variables, tx)
        self.start_epoch = 0

        self.train_step = make_train_step(model)
        self.eval_step = make_eval_step(model)
        self.logger = SummaryLogger(logdir)

    # -- checkpointing ------------------------------------------------------
    def resume(self) -> bool:
        latest = find_latest(self.logdir)
        if latest is None:
            return False
        self.state, self.start_epoch = restore_checkpoint(latest, self.state)
        print(f"Resuming from {latest} at epoch {self.start_epoch}")
        return True

    def load(self, path: str) -> None:
        self.state, _ = restore_checkpoint(path, self.state)

    def _check_plan(self, plan_ok, epoch: int, batch_idx: int):
        """Sync and verify the accumulated paired-sweep plan validity.

        A False here means some batch since the last check had geometry
        outside the planned kernel envelope, i.e. its gradients are NOT
        trustworthy (the paired kernels never fall back): raise (default) or
        warn per ``plan_check``. Returns the reset accumulator (None)."""
        if plan_ok is None:
            return None
        if not bool(plan_ok):
            msg = (
                f"paired Pallas sweep plan INVALID at epoch {epoch}, around "
                f"iter {batch_idx} (within the last summary window): a "
                "batch's rig geometry exceeded the planned kernel envelope "
                "and its gradients are untrustworthy. Re-plan envelopes "
                "over the full rig family (suggest_family_envelopes with "
                "more samples / larger margins) or disable the paired path."
            )
            if self.plan_check == "raise":
                raise RuntimeError(msg)
            print(f"WARNING: {msg}")
        return None

    # -- loops ---------------------------------------------------------------
    def train(self) -> dict[str, float]:
        # async D2H channel warmup (see eval/depth_gen.py): the first host
        # materialization of the process — otherwise the step-0 summary's
        # float(loss) — pays the axon tunnel's lazy channel setup
        # (31-130+ s measured). Overlap it with the first batches' decode.
        import threading

        import jax.numpy as jnp

        threading.Thread(
            target=lambda: np.asarray(jnp.zeros((8,)) + 1), daemon=True
        ).start()
        final_test: dict[str, float] = {}
        # running AND of the paired-sweep plan validity (ops/paired_sweep.py);
        # kept on device so it never forces a per-step host sync, checked at
        # the summary cadence and at every epoch end
        plan_ok = None
        for epoch in range(self.start_epoch, self.epochs):
            print(f"Epoch {epoch}:")
            t_epoch = time.time()
            n_samples = 0
            steps = len(self.train_loader)
            # pack_u8_imgs in the producer thread: 4x less host->device
            # image bandwidth per step (same f32 values enter the network;
            # see data/pipeline.py)
            for batch_idx, batch in enumerate(
                BackgroundLoader(self.train_loader, transform=pack_u8_imgs)
            ):
                t0 = time.time()
                global_step = int(self.state.step)
                n_samples += int(batch["imgs"].shape[0])
                self.state, aux = self.train_step(self.state, batch)
                if "plan_valid" in aux and self.plan_check != "off":
                    plan_ok = (
                        aux["plan_valid"]
                        if plan_ok is None
                        else jax.numpy.logical_and(plan_ok, aux["plan_valid"])
                    )
                if global_step % self.summary_freq == 0:
                    plan_ok = self._check_plan(plan_ok, epoch, batch_idx)
                    scalars = _scalars(aux)
                    self.logger.save_scalars("train", scalars, global_step)
                    self.logger.save_images("train", _images(aux, batch), global_step)
                    if self.debug_mvsnet:
                        from ..utils.debug_dump import debug_forward

                        debug_forward(
                            self.model, self.state.variables,
                            batch["imgs"], batch["proj_matrices"],
                            batch["depth_values"], self.debug_mvsnet,
                            os.path.join(
                                self.logdir, "debug_train",
                                f"step{global_step:06d}",
                            ),
                        )
                    lr_now = float(self.schedule(global_step))
                    msg = ", ".join(f"{k}={v:.3f}" for k, v in scalars.items())
                    print(
                        f"Epoch {epoch}/{self.epochs}, Iter {batch_idx}/{steps}, "
                        f"LR:{lr_now:.2E}, {msg}, time={time.time() - t0:.3f}"
                    )

            plan_ok = self._check_plan(plan_ok, epoch, steps - 1)
            # epoch throughput: the end-to-end number (real input pipeline
            # + async dispatch), parsed by scripts/bench_train_e2e.py. The
            # final step's device work may still be in flight; plan_ok sync
            # above already forced the queue when the paired path is on.
            jax.block_until_ready(self.state.params)
            dt_epoch = time.time() - t_epoch
            print(
                f"epoch {epoch} train wall: {dt_epoch:.2f}s "
                f"({n_samples} samples, {n_samples / max(dt_epoch, 1e-9):.3f} "
                f"samples/s end-to-end)"
            )

            if (epoch + 1) % self.save_freq == 0:
                path = save_checkpoint(self.logdir, epoch, self.state)
                print(f"Saved checkpoint {path}")

            final_test = self.test(epoch=epoch)
            self.logger.save_scalars("fulltest", final_test, int(self.state.step))
            print("avg_test_scalars:", final_test)
        return final_test

    def test(self, epoch: int | None = None) -> dict[str, float]:
        meter = DictAverageMeter()
        variables = self.state.variables
        for batch_idx, batch in enumerate(
            BackgroundLoader(self.test_loader, transform=pack_u8_imgs)
        ):
            aux = self.eval_step(variables, batch)
            scalars = _scalars(aux)
            meter.update(scalars)
            if int(self.state.step) % self.summary_freq == 0 and batch_idx == 0:
                self.logger.save_scalars("test", scalars, int(self.state.step))
                self.logger.save_images("test", _images(aux, batch), int(self.state.step))
        return meter.mean() if meter.count else {}

    def profile(self, warmup_iters: int = 5, profile_iters: int = 5) -> str:
        """Warm up, then trace eval steps -> trace dir under logdir."""
        it = iter(self.test_loader)
        variables = self.state.variables

        def one(batch):
            aux = self.eval_step(variables, batch)
            jax.block_until_ready(aux["loss"])
            return aux

        batches = []
        for _ in range(max(warmup_iters, profile_iters)):
            try:
                batches.append(next(it))
            except StopIteration:
                it = iter(self.test_loader)
                batches.append(next(it))

        for i in range(warmup_iters):
            t0 = time.time()
            one(batches[i % len(batches)])
            print(f"WarmUp Iter {i}, time = {time.time() - t0:.4f}")

        trace_dir = os.path.join(self.logdir, "profile")
        with jax.profiler.trace(trace_dir):
            for i in range(profile_iters):
                t0 = time.time()
                one(batches[i % len(batches)])
                print(f"Profile Iter {i}, time = {time.time() - t0:.4f}")
        print(f"Profiler trace written to {trace_dir}")
        return trace_dir
