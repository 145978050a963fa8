"""Model registry. ``find_model_def(name)`` mirrors the reference's
``--model mvsnet`` selector (/root/reference/train.py:26)."""

from .blocks import (
    ConvBnReLU,
    ConvBnReLU3D,
    ConvTransposeBnReLU3D,
    BasicBlock,
    Hourglass3d,
)
from .feature_net import FeatureNet
from .cost_reg_net import CostRegNet
from .refine_net import RefineNet
from .mvsnet import MVSNet, mvsnet_loss

_MODELS = {"mvsnet": MVSNet}


def find_model_def(name: str):
    try:
        return _MODELS[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_MODELS)}")


__all__ = [
    "ConvBnReLU",
    "ConvBnReLU3D",
    "ConvTransposeBnReLU3D",
    "BasicBlock",
    "Hourglass3d",
    "FeatureNet",
    "CostRegNet",
    "RefineNet",
    "MVSNet",
    "mvsnet_loss",
    "find_model_def",
]
