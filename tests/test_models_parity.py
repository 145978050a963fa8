"""End-to-end numerical parity of the flax MVSNet vs an independent
functional torch oracle driven by the *same* weights (random, in reference
state-dict naming), exercising the torch-checkpoint importer on the way.

The oracle is written functionally from the MVSNet architecture spec
(FeatureNet / variance plane sweep / CostRegNet U-Net / softmax tail) using
torch library ops only."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.models import MVSNet, mvsnet_loss
from scene_3dreconstruction_mvsnet_tpu.interop import (
    import_torch_state_dict,
    export_torch_state_dict,
)
from tests.test_sampling import _random_projection, _torch_homo_warp
from tests.test_regression_ops import _torch_tail


# ---------------------------------------------------------------- weights --
def _rand_state_dict(rng, refine=False):
    """Random reference-shaped MVSNet state dict (keys as saved by the
    reference trainer, incl. the DataParallel 'module.' prefix)."""
    sd = {}

    def conv_bn(prefix, cin, cout, k, ndim):
        shape = (cout, cin) + (k,) * ndim
        sd[f"{prefix}.conv.weight"] = rng.randn(*shape).astype(np.float32) * 0.2
        sd[f"{prefix}.bn.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{prefix}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_var"] = rng.rand(cout).astype(np.float32) + 0.5

    f = "module.feature"
    conv_bn(f"{f}.conv0", 3, 8, 3, 2)
    conv_bn(f"{f}.conv1", 8, 8, 3, 2)
    conv_bn(f"{f}.conv2", 8, 16, 5, 2)
    conv_bn(f"{f}.conv3", 16, 16, 3, 2)
    conv_bn(f"{f}.conv4", 16, 16, 3, 2)
    conv_bn(f"{f}.conv5", 16, 32, 5, 2)
    conv_bn(f"{f}.conv6", 32, 32, 3, 2)
    sd[f"{f}.feature.weight"] = rng.randn(32, 32, 3, 3).astype(np.float32) * 0.2
    sd[f"{f}.feature.bias"] = rng.randn(32).astype(np.float32) * 0.1

    c = "module.cost_regularization"
    conv_bn(f"{c}.conv0", 32, 8, 3, 3)
    conv_bn(f"{c}.conv1", 8, 16, 3, 3)
    conv_bn(f"{c}.conv2", 16, 16, 3, 3)
    conv_bn(f"{c}.conv3", 16, 32, 3, 3)
    conv_bn(f"{c}.conv4", 32, 32, 3, 3)
    conv_bn(f"{c}.conv5", 32, 64, 3, 3)
    conv_bn(f"{c}.conv6", 64, 64, 3, 3)
    for blk, (cin, cout) in {"conv7": (64, 32), "conv9": (32, 16), "conv11": (16, 8)}.items():
        sd[f"{c}.{blk}.0.weight"] = rng.randn(cin, cout, 3, 3, 3).astype(np.float32) * 0.2
        sd[f"{c}.{blk}.1.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{c}.{blk}.1.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{c}.{blk}.1.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{c}.{blk}.1.running_var"] = rng.rand(cout).astype(np.float32) + 0.5
    sd[f"{c}.prob.weight"] = rng.randn(1, 8, 3, 3, 3).astype(np.float32) * 0.2
    sd[f"{c}.prob.bias"] = rng.randn(1).astype(np.float32) * 0.1
    return sd


# ----------------------------------------------------------------- oracle --
def _t(sd, key):
    return torch.from_numpy(sd[key])


def _cbr(x, sd, prefix, stride, pad, ndim=2, relu=True):
    conv = F.conv2d if ndim == 2 else F.conv3d
    x = conv(x, _t(sd, f"{prefix}.conv.weight"), stride=stride, padding=pad)
    x = F.batch_norm(
        x,
        _t(sd, f"{prefix}.bn.running_mean"),
        _t(sd, f"{prefix}.bn.running_var"),
        _t(sd, f"{prefix}.bn.weight"),
        _t(sd, f"{prefix}.bn.bias"),
        training=False,
        eps=1e-5,
    )
    return F.relu(x) if relu else x


def _t_feature(x, sd):
    f = "module.feature"
    x = _cbr(x, sd, f"{f}.conv0", 1, 1)
    x = _cbr(x, sd, f"{f}.conv1", 1, 1)
    x = _cbr(x, sd, f"{f}.conv2", 2, 2)
    x = _cbr(x, sd, f"{f}.conv3", 1, 1)
    x = _cbr(x, sd, f"{f}.conv4", 1, 1)
    x = _cbr(x, sd, f"{f}.conv5", 2, 2)
    x = _cbr(x, sd, f"{f}.conv6", 1, 1)
    return F.conv2d(x, _t(sd, f"{f}.feature.weight"), _t(sd, f"{f}.feature.bias"), 1, 1)


def _t_deconv_bn_relu(x, sd, prefix):
    x = F.conv_transpose3d(
        x, _t(sd, f"{prefix}.0.weight"), stride=2, padding=1, output_padding=1
    )
    x = F.batch_norm(
        x,
        _t(sd, f"{prefix}.1.running_mean"),
        _t(sd, f"{prefix}.1.running_var"),
        _t(sd, f"{prefix}.1.weight"),
        _t(sd, f"{prefix}.1.bias"),
        training=False,
        eps=1e-5,
    )
    return F.relu(x)


def _t_costreg(x, sd):
    c = "module.cost_regularization"
    c0 = _cbr(x, sd, f"{c}.conv0", 1, 1, ndim=3)
    c2 = _cbr(_cbr(c0, sd, f"{c}.conv1", 2, 1, ndim=3), sd, f"{c}.conv2", 1, 1, ndim=3)
    c4 = _cbr(_cbr(c2, sd, f"{c}.conv3", 2, 1, ndim=3), sd, f"{c}.conv4", 1, 1, ndim=3)
    x = _cbr(_cbr(c4, sd, f"{c}.conv5", 2, 1, ndim=3), sd, f"{c}.conv6", 1, 1, ndim=3)
    x = c4 + _t_deconv_bn_relu(x, sd, f"{c}.conv7")
    x = c2 + _t_deconv_bn_relu(x, sd, f"{c}.conv9")
    x = c0 + _t_deconv_bn_relu(x, sd, f"{c}.conv11")
    return F.conv3d(x, _t(sd, f"{c}.prob.weight"), _t(sd, f"{c}.prob.bias"), 1, 1)


def _t_mvsnet_eval(sd, imgs_bvchw, projs, depth_values):
    B, V = imgs_bvchw.shape[:2]
    feats = [_t_feature(imgs_bvchw[:, v], sd) for v in range(V)]
    ref_proj = projs[:, 0]
    D = depth_values.shape[1]

    ref_volume = feats[0].unsqueeze(2).repeat(1, 1, D, 1, 1)
    vol_sum = ref_volume.clone()
    vol_sq = ref_volume**2
    for v in range(1, V):
        w = _torch_homo_warp(feats[v], projs[:, v], ref_proj, depth_values)
        vol_sum = vol_sum + w
        vol_sq = vol_sq + w**2
    variance = vol_sq / V - (vol_sum / V) ** 2

    cost_reg = _t_costreg(variance, sd).squeeze(1)
    return _t_tail_wrap(cost_reg, depth_values)


def _t_tail_wrap(cost_reg, depth_values):
    return _torch_tail(cost_reg, depth_values)


# ------------------------------------------------------------------ tests --
def _scene(rng, B=1, V=3, H=32, W=32, D=8):
    imgs = rng.rand(B, V, H, W, 3).astype(np.float32)
    projs = np.stack(
        [_random_projection(rng, B)[0] for _ in range(V)], axis=0
    )[None].astype(np.float32)
    dv = np.linspace(40.0, 60.0, D, dtype=np.float32)[None].repeat(B, 0)
    return imgs, projs, dv


def test_full_mvsnet_eval_parity(rng):
    imgs, projs, dv = _scene(rng)
    sd = _rand_state_dict(rng)

    variables = import_torch_state_dict(sd)
    model = MVSNet(refine=False)
    out = model.apply(
        variables, jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(dv), train=False
    )

    t_imgs = torch.from_numpy(np.transpose(imgs, (0, 1, 4, 2, 3)))
    t_depth, t_conf = _t_mvsnet_eval(
        sd, t_imgs, torch.from_numpy(projs), torch.from_numpy(dv)
    )

    depth_range = dv.max() - dv.min()
    abs_err = np.abs(np.asarray(out["depth"]) - t_depth.numpy())
    assert abs_err.max() < 1e-3 * depth_range, f"max depth err {abs_err.max()}"
    np.testing.assert_allclose(
        np.asarray(out["photometric_confidence"]), t_conf.numpy(), atol=1e-4
    )


def test_depth_chunked_model_matches_unchunked(rng):
    imgs, projs, dv = _scene(rng)
    sd = _rand_state_dict(rng)
    variables = import_torch_state_dict(sd)
    out_full = MVSNet().apply(
        variables, jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(dv)
    )
    out_chunk = MVSNet(depth_chunk=4).apply(
        variables, jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(dv)
    )
    np.testing.assert_allclose(
        np.asarray(out_full["depth"]), np.asarray(out_chunk["depth"]), atol=1e-4
    )


def test_import_export_roundtrip(rng):
    sd = _rand_state_dict(rng)
    variables = import_torch_state_dict(sd)
    back = export_torch_state_dict(variables)
    assert set(back) == {k for k in sd}
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_init_shapes_match_imported(rng):
    """Fresh-init variable tree must be congruent with the imported one
    (same structure and leaf shapes) so checkpoints are interchangeable."""
    imgs, projs, dv = _scene(rng)
    model = MVSNet()
    # shapes only — eval_shape avoids compiling/executing the full forward
    init_vars = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(projs),
            jnp.asarray(dv),
        )
    )
    imported = import_torch_state_dict(_rand_state_dict(rng))

    def shapes(tree):
        return jax.tree.map(lambda x: jnp.shape(x), tree)

    assert jax.tree_util.tree_structure(shapes(init_vars)) == jax.tree_util.tree_structure(
        shapes(imported)
    )
    assert jax.tree.all(
        jax.tree.map(lambda a, b: jnp.shape(a) == jnp.shape(b), init_vars, imported)
    )


def test_loss_matches_torch(rng):
    est = rng.rand(2, 8, 8).astype(np.float32) * 10
    gt = rng.rand(2, 8, 8).astype(np.float32) * 10
    mask = (rng.rand(2, 8, 8) > 0.4).astype(np.float32)
    ours = mvsnet_loss(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    t = F.smooth_l1_loss(
        torch.from_numpy(est)[torch.from_numpy(mask) > 0.5],
        torch.from_numpy(gt)[torch.from_numpy(mask) > 0.5],
    )
    np.testing.assert_allclose(float(ours), float(t), rtol=1e-6)


def test_refine_net_runs(rng):
    imgs, projs, dv = _scene(rng)
    model = MVSNet(refine=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(dv)
    )
    out = model.apply(variables, jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(dv))
    assert out["refined_depth"].shape == out["depth"].shape
    assert np.all(np.isfinite(np.asarray(out["refined_depth"])))


def test_train_mode_bn_stats_update(rng):
    """Train-mode BatchNorm: batch stats must be used and running stats
    updated torch-style (momentum 0.1 on the running buffers)."""
    from scene_3dreconstruction_mvsnet_tpu.models import ConvBnReLU

    x = rng.randn(4, 8, 8, 3).astype(np.float32)
    blk = ConvBnReLU(8)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, mutated = blk.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )

    tw = np.transpose(np.asarray(variables["params"]["conv"]["kernel"]), (3, 2, 0, 1))
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tconv = F.conv2d(tx, torch.from_numpy(tw), stride=1, padding=1)
    rm = torch.zeros(8)
    rv = torch.ones(8)
    ty = F.relu(
        F.batch_norm(tconv, rm, rv, torch.ones(8), torch.zeros(8), training=True, momentum=0.1, eps=1e-5)
    )
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(ty.numpy(), (0, 2, 3, 1)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["mean"]), rm.numpy(), atol=1e-5
    )
    # torch tracks unbiased running var; flax tracks biased. Both are valid
    # normalizers at eval; assert ours matches the biased batch var update.
    bv = tconv.permute(1, 0, 2, 3).reshape(8, -1).var(dim=1, unbiased=False).numpy()
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["var"]),
        0.9 * 1.0 + 0.1 * bv,
        rtol=1e-4,
    )
