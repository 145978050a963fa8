from .lr import parse_lrepochs, multistep_lr
from .metrics import depth_metrics, abs_depth_error, threshold_error_rate
from .state import (
    TrainState,
    make_optimizer,
    make_train_step,
    make_eval_step,
    make_infer_step,
    make_infer_step_views,
)
from .checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    restore_variables,
    find_latest,
)
from .logging import SummaryLogger
from .loop import Trainer

__all__ = [
    "parse_lrepochs",
    "multistep_lr",
    "depth_metrics",
    "abs_depth_error",
    "threshold_error_rate",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_infer_step",
    "make_infer_step_views",
    "save_checkpoint",
    "restore_checkpoint",
    "restore_variables",
    "find_latest",
    "SummaryLogger",
    "Trainer",
]
