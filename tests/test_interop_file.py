"""End-to-end torch checkpoint file interop: a reference-format .ckpt file
on disk must load through eval's --loadckpt path and drive the model."""

import numpy as np
import torch
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.interop import load_torch_checkpoint
from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from tests.test_models_parity import _rand_state_dict, _scene


def test_load_torch_checkpoint_file(tmp_path, rng):
    sd = _rand_state_dict(rng)
    ckpt = {
        "epoch": 15,
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
        "optimizer": {},
    }
    path = str(tmp_path / "model_000015.ckpt")
    torch.save(ckpt, path)

    variables = load_torch_checkpoint(path)
    imgs, projs, dv = _scene(rng)
    out = MVSNet().apply(
        variables, jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(dv)
    )
    assert np.isfinite(np.asarray(out["depth"])).all()
    assert out["depth"].shape == (1, 8, 8)


def test_load_bare_state_dict_file(tmp_path, rng):
    sd = _rand_state_dict(rng)
    path = str(tmp_path / "bare.ckpt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    variables = load_torch_checkpoint(path)
    assert "params" in variables and "batch_stats" in variables
