"""PyTorch MVSNet checkpoint <-> flax pytree conversion.

The reference saves ``{'epoch', 'model': state_dict, 'optimizer': ...}``
(/root/reference/train.py:192-197) with ``nn.DataParallel``'s ``module.``
name prefix. This module maps that state dict onto our flax variables
(``{"params": ..., "batch_stats": ...}``) for the bit-parity requirement in
BASELINE.md (<1 mm mean abs depth delta vs released PyTorch weights).

Layout conversions:
  conv2d    weight [O, I, kh, kw]       -> kernel [kh, kw, I, O]
  conv3d    weight [O, I, kd, kh, kw]   -> kernel [kd, kh, kw, I, O]
  convT3d   weight [I, O, kd, kh, kw]   -> correlation kernel
            flip(spatial) + transpose   -> [kd, kh, kw, I, O]
            (our ConvTransposeBnReLU3D stores the input-dilated correlation
            kernel; see models/blocks.py)
  batchnorm weight/bias                 -> scale/bias   (params)
            running_mean/running_var    -> mean/var     (batch_stats)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_FEATURE_BN_BLOCKS = [f"conv{i}" for i in range(7)]
_COSTREG_CONV_BLOCKS = [f"conv{i}" for i in range(7)]
_COSTREG_DECONV_BLOCKS = ["conv7", "conv9", "conv11"]
_REFINE_BLOCKS = ["conv1", "conv2", "conv3", "res"]


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch.Tensor without importing torch at module scope
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _strip_prefix(state: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _np(v)
    return out


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT3d(w: np.ndarray) -> np.ndarray:
    # torch [I, O, kd, kh, kw]: flip spatial dims, move to DHWIO.
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()


def _bn(state: dict, prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": state[f"{prefix}.weight"],
        "bias": state[f"{prefix}.bias"],
    }
    stats = {
        "mean": state[f"{prefix}.running_mean"],
        "var": state[f"{prefix}.running_var"],
    }
    return params, stats


def _conv_bn_block(state: dict, prefix: str, conv_fn) -> tuple[dict, dict]:
    bn_params, bn_stats = _bn(state, f"{prefix}.bn")
    params = {"conv": {"kernel": conv_fn(state[f"{prefix}.conv.weight"])}, "bn": bn_params}
    return params, {"bn": bn_stats}


def import_torch_state_dict(
    state_dict: Mapping[str, Any], refine: bool = False
) -> dict[str, Any]:
    """Convert a reference MVSNet state dict to flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching
    models.MVSNet's variable tree. Raises KeyError with the missing torch
    key if the state dict does not look like a reference MVSNet.
    """
    state = _strip_prefix(state_dict)

    params: dict[str, Any] = {"feature": {}, "cost_regularization": {}}
    stats: dict[str, Any] = {"feature": {}, "cost_regularization": {}}

    for blk in _FEATURE_BN_BLOCKS:
        p, s = _conv_bn_block(state, f"feature.{blk}", _conv2d)
        params["feature"][blk] = p
        stats["feature"][blk] = s
    params["feature"]["feature"] = {
        "kernel": _conv2d(state["feature.feature.weight"]),
        "bias": state["feature.feature.bias"],
    }

    for blk in _COSTREG_CONV_BLOCKS:
        p, s = _conv_bn_block(state, f"cost_regularization.{blk}", _conv3d)
        params["cost_regularization"][blk] = p
        stats["cost_regularization"][blk] = s
    for blk in _COSTREG_DECONV_BLOCKS:
        # torch Sequential: .0 = ConvTranspose3d, .1 = BatchNorm3d
        bn_params, bn_stats = _bn(state, f"cost_regularization.{blk}.1")
        params["cost_regularization"][blk] = {
            "kernel": _convT3d(state[f"cost_regularization.{blk}.0.weight"]),
            "bn": bn_params,
        }
        stats["cost_regularization"][blk] = {"bn": bn_stats}
    params["cost_regularization"]["prob"] = {
        "kernel": _conv3d(state["cost_regularization.prob.weight"]),
        "bias": state["cost_regularization.prob.bias"],
    }

    if refine:
        params["refine_network"] = {}
        stats["refine_network"] = {}
        for blk in _REFINE_BLOCKS:
            p, s = _conv_bn_block(state, f"refine_network.{blk}", _conv2d)
            params["refine_network"][blk] = p
            stats["refine_network"][blk] = s

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, refine: bool = False) -> dict[str, Any]:
    """Load a reference ``model_XXXXXX.ckpt`` file and convert. Accepts both
    the training-checkpoint dict layout (``{'model': state_dict, ...}``) and
    a bare state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return import_torch_state_dict(state, refine=refine)


def export_torch_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse conversion (flax variables -> torch-layout state dict with
    ``module.`` prefix) so checkpoints trained here can be consumed by
    reference tooling."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}.running_var"] = np.asarray(s["var"])

    def put_conv_bn(prefix, p, s, ndim):
        k = np.asarray(p["conv"]["kernel"])
        out[f"{prefix}.conv.weight"] = (
            np.transpose(k, (3, 2, 0, 1)) if ndim == 2 else np.transpose(k, (4, 3, 0, 1, 2))
        )
        put_bn(f"{prefix}.bn", p["bn"], s["bn"])

    for blk in _FEATURE_BN_BLOCKS:
        put_conv_bn(f"module.feature.{blk}", params["feature"][blk], stats["feature"][blk], 2)
    fk = np.asarray(params["feature"]["feature"]["kernel"])
    out["module.feature.feature.weight"] = np.transpose(fk, (3, 2, 0, 1))
    out["module.feature.feature.bias"] = np.asarray(params["feature"]["feature"]["bias"])

    for blk in _COSTREG_CONV_BLOCKS:
        put_conv_bn(
            f"module.cost_regularization.{blk}",
            params["cost_regularization"][blk],
            stats["cost_regularization"][blk],
            3,
        )
    for blk in _COSTREG_DECONV_BLOCKS:
        k = np.asarray(params["cost_regularization"][blk]["kernel"])
        out[f"module.cost_regularization.{blk}.0.weight"] = np.transpose(
            k[::-1, ::-1, ::-1], (3, 4, 0, 1, 2)
        ).copy()
        put_bn(
            f"module.cost_regularization.{blk}.1",
            params["cost_regularization"][blk]["bn"],
            stats["cost_regularization"][blk]["bn"],
        )
    pk = np.asarray(params["cost_regularization"]["prob"]["kernel"])
    out["module.cost_regularization.prob.weight"] = np.transpose(pk, (4, 3, 0, 1, 2))
    out["module.cost_regularization.prob.bias"] = np.asarray(
        params["cost_regularization"]["prob"]["bias"]
    )

    if "refine_network" in params:
        for blk in _REFINE_BLOCKS:
            put_conv_bn(
                f"module.refine_network.{blk}",
                params["refine_network"][blk],
                stats["refine_network"][blk],
                2,
            )
    return out
