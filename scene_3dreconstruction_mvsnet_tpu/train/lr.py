"""Learning-rate schedule DSL.

The reference encodes its MultiStepLR as ``--lrepochs "10,12,14:2"`` —
milestone epochs before the colon, LR *divisor* after
(/root/reference/train.py:158-160). We map it to an optax
piecewise-constant schedule over steps.

Note: the reference calls ``lr_scheduler.step()`` at the *top* of each epoch
loop (a legacy-order quirk, /root/reference/train.py:164). We implement the
standard semantics — epoch e trains with lr0 / divisor^(#milestones <= e) —
per SURVEY.md §7's decision log.
"""

from __future__ import annotations

import optax


def parse_lrepochs(spec: str) -> tuple[list[int], float]:
    """'10,12,14:2' -> ([10, 12, 14], 0.5) (milestones, gamma)."""
    milestones_str, divisor_str = spec.split(":")
    milestones = [int(e) for e in milestones_str.split(",") if e]
    gamma = 1.0 / float(divisor_str)
    return milestones, gamma


def multistep_lr(
    base_lr: float, lrepochs: str, steps_per_epoch: int
) -> optax.Schedule:
    """Step-indexed schedule equivalent of MultiStepLR(milestones, gamma)."""
    milestones, gamma = parse_lrepochs(lrepochs)
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)
