"""Eval pipeline tests: on-device reprojection vs a numpy+cv2 oracle
(cv2.remap is the exact op the reference calls), fusion semantics, and the
end-to-end two-stage CLI pipeline on a synthetic scene tree."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.data.synthetic import SyntheticRig
from scene_3dreconstruction_mvsnet_tpu.eval.filtering import (
    check_geometric_consistency,
    fuse_reference_view,
    reproject_with_depth,
)


def _np_reproject_oracle(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """Numpy + cv2.remap oracle implementing the published MVSNet fusion
    reprojection: ref->src projection, bilinear depth resample, src->ref
    return projection."""
    h, w = depth_ref.shape
    x_ref, y_ref = np.meshgrid(np.arange(w), np.arange(h))
    x_ref, y_ref = x_ref.reshape(-1), y_ref.reshape(-1)
    xyz_ref = np.linalg.inv(K_ref) @ (
        np.vstack([x_ref, y_ref, np.ones_like(x_ref)]) * depth_ref.reshape(-1)
    )
    xyz_src = (E_src @ np.linalg.inv(E_ref)) @ np.vstack(
        [xyz_ref, np.ones_like(x_ref)]
    )
    xyz_src = xyz_src[:3]
    k_xyz = K_src @ xyz_src
    xy_src = k_xyz[:2] / k_xyz[2:3]

    x_src = xy_src[0].reshape(h, w).astype(np.float32)
    y_src = xy_src[1].reshape(h, w).astype(np.float32)
    sampled = cv2.remap(depth_src, x_src, y_src, interpolation=cv2.INTER_LINEAR)

    xyz_src2 = np.linalg.inv(K_src) @ (
        np.vstack([xy_src, np.ones_like(x_ref)]) * sampled.reshape(-1)
    )
    xyz_rp = (E_ref @ np.linalg.inv(E_src)) @ np.vstack(
        [xyz_src2, np.ones_like(x_ref)]
    )
    xyz_rp = xyz_rp[:3]
    depth_rp = xyz_rp[2].reshape(h, w).astype(np.float32)
    k_rp = K_ref @ xyz_rp
    xy_rp = k_rp[:2] / k_rp[2:3]
    return (
        depth_rp,
        xy_rp[0].reshape(h, w).astype(np.float32),
        xy_rp[1].reshape(h, w).astype(np.float32),
    )


@pytest.fixture(scope="module")
def fusion_scene():
    rig = SyntheticRig(n_views=4, img_hw=(64, 96), baseline=3.0)
    depths = [rig.depth_map(v) for v in range(rig.n_views)]
    Ks = [rig.K.copy() for _ in range(rig.n_views)]
    Es = [rig.extrinsics(v) for v in range(rig.n_views)]
    return rig, depths, Ks, Es


def test_reprojection_matches_cv2_oracle(fusion_scene):
    rig, depths, Ks, Es = fusion_scene
    ours = reproject_with_depth(
        jnp.asarray(depths[0]), jnp.asarray(Ks[0]), jnp.asarray(Es[0]),
        jnp.asarray(depths[1]), jnp.asarray(Ks[1]), jnp.asarray(Es[1]),
    )
    oracle = _np_reproject_oracle(depths[0], Ks[0], Es[0], depths[1], Ks[1], Es[1])

    # interiors must agree tightly; cv2.remap's border handling differs only
    # in the out-of-bounds band
    h, w = depths[0].shape
    sl = np.s_[2:-2, 8:-8]
    np.testing.assert_allclose(np.asarray(ours[0])[sl], oracle[0][sl], atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours[1])[sl], oracle[1][sl], atol=5e-3)
    np.testing.assert_allclose(np.asarray(ours[2])[sl], oracle[2][sl], atol=5e-3)


def test_consistency_on_perfect_depths(fusion_scene):
    """Analytically consistent depth maps must pass the geometric check in
    the mutually visible region."""
    rig, depths, Ks, Es = fusion_scene
    mask, depth_rp, _, _ = check_geometric_consistency(
        jnp.asarray(depths[0]), jnp.asarray(Ks[0]), jnp.asarray(Es[0]),
        jnp.asarray(depths[1]), jnp.asarray(Ks[1]), jnp.asarray(Es[1]),
        condmask_pixel=1.0, condmask_depth=0.01,
    )
    mask = np.asarray(mask)
    # camera 1 sits at +x: ref pixels right of the overlap boundary are
    # covered; demand near-total consistency there
    covered = mask[:, 16:]
    assert covered.mean() > 0.98, covered.mean()
    # reprojected depth equals ref depth where masked
    d = np.asarray(depth_rp)
    err = np.abs(d[mask] - depths[0][mask]) / depths[0][mask]
    assert err.max() < 0.01


def test_consistency_rejects_wrong_depth(fusion_scene):
    rig, depths, Ks, Es = fusion_scene
    wrong = depths[1] * 1.2  # 20% depth error >> 1% threshold
    mask, _, _, _ = check_geometric_consistency(
        jnp.asarray(depths[0]), jnp.asarray(Ks[0]), jnp.asarray(Es[0]),
        jnp.asarray(wrong), jnp.asarray(Ks[1]), jnp.asarray(Es[1]),
    )
    assert np.asarray(mask).mean() < 0.05


def test_fuse_reference_view(fusion_scene):
    rig, depths, Ks, Es = fusion_scene
    confidence = np.full_like(depths[0], 0.9)
    out = fuse_reference_view(
        depths[0], confidence, Ks[0], Es[0],
        np.stack(depths[1:]), np.stack(Ks[1:]), np.stack(Es[1:]),
        photomask=0.5, geomask=3, condmask_pixel=1.0, condmask_depth=0.01,
    )
    # all 3 sources consistent -> geo_mask_sum == 3 in the covered region
    assert out["geo_mask_sum"].max() == 3
    m = out["final_mask"]
    assert m.any()
    # fused depth equals analytic depth where all views agree
    err = np.abs(out["depth_est_averaged"][m] - depths[0][m]) / depths[0][m]
    assert np.median(err) < 2e-3
    # photometric rejection: threshold above confidence kills everything
    out2 = fuse_reference_view(
        depths[0], confidence, Ks[0], Es[0],
        np.stack(depths[1:]), np.stack(Ks[1:]), np.stack(Es[1:]),
        photomask=0.95,
    )
    assert not out2["final_mask"].any()


def test_fuse_scan_matches_per_view(fusion_scene):
    """The single-launch whole-scan filter must reproduce the per-view
    path exactly, including ragged source lists."""
    from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_scan

    rig, depths, Ks, Es = fusion_scene
    conf = [np.full_like(depths[v], 0.6 + 0.1 * v) for v in range(rig.n_views)]
    # ragged pair data: view 2 has fewer sources
    pair_data = [
        (0, [1, 2, 3]),
        (1, [0, 2, 3]),
        (2, [3]),
        (3, [0, 1, 2]),
    ]
    results = fuse_scan(
        np.stack(depths), np.stack(conf), np.stack(Ks), np.stack(Es),
        pair_data, [0, 1, 2, 3],
        NviewFilter=3, photomask=0.65, geomask=2,
        condmask_pixel=1.0, condmask_depth=0.01,
    )
    for (ref_view, src_views), got in zip(pair_data, results):
        want = fuse_reference_view(
            depths[ref_view], conf[ref_view], Ks[ref_view], Es[ref_view],
            np.stack([depths[s] for s in src_views]),
            np.stack([Ks[s] for s in src_views]),
            np.stack([Es[s] for s in src_views]),
            photomask=0.65, geomask=2, condmask_pixel=1.0, condmask_depth=0.01,
        )
        np.testing.assert_array_equal(got["photo_mask"], want["photo_mask"])
        np.testing.assert_array_equal(got["geo_mask"], want["geo_mask"])
        np.testing.assert_array_equal(got["final_mask"], want["final_mask"])
        np.testing.assert_allclose(
            got["depth_est_averaged"], want["depth_est_averaged"], rtol=1e-6
        )


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    """Full two-stage pipeline through the eval.py CLI on a synthetic eval
    tree with a fresh-init model: checks the on-disk output contract
    (images/depth_est/confidence/cams/mask trees + PLY)."""
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        make_eval_tree,
        write_scan_list,
    )

    root = tmp_path / "acq"
    rig = SyntheticRig(n_views=4, img_hw=(64, 96), baseline=3.0)
    make_eval_tree(str(root), scan="scan1", rig=rig, ndepths=16)
    write_scan_list(str(root / "test.txt"), ["scan1"])

    # random-weight orbax checkpoint
    import jax
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train import (
        TrainState,
        make_optimizer,
        save_checkpoint,
    )

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    state = TrainState.create(variables, make_optimizer(lambda s: 1e-3))
    ckpt_dir = save_checkpoint(str(tmp_path / "log"), 0, state)

    outdir = str(tmp_path / "outputs")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, os.path.join(repo, "eval.py"),
        "--dataset", "dataloader_eval", "--dataset_name", "bds8",
        "--testpath", str(root), "--testlist", str(root / "test.txt"),
        "--loadckpt", ckpt_dir, "--outdir", outdir,
        "--NviewGen", "3", "--NviewFilter", "3", "--numdepth", "16",
        "--interval_scale", "1.0", "--photomask", "0.0",
        "--geomask", "1", "--condmask_pixel", "6.0", "--condmask_depth", "0.5",
        "--save_ply", "--num_workers", "0",
        "--debug_depth_gen", "15", "--debug_depth_filter", "7",
        # synthetic tree is 64x96 with plain subfolder names
        "--img_res", "64", "96",
        "--cam_subfolder", "Cameras",
        "--img_subfolder", "Rectified/{}/rect_C{:0>3}_L00.png",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    out_scan = os.path.join(outdir, "acq", "scan1")
    for v in range(4):
        assert os.path.exists(os.path.join(out_scan, f"depth_est/{v:0>8}.pfm"))
        assert os.path.exists(os.path.join(out_scan, f"confidence/{v:0>8}.pfm"))
        assert os.path.exists(os.path.join(outdir, "acq", "scan1", "cams", f"00000{v:0>3}_cam.txt"))
        assert os.path.exists(os.path.join(out_scan, f"mask/{v:0>8}_final.png"))
    ply = os.path.join(outdir, "acq", "mvsnet001_l3.ply")
    assert os.path.exists(ply)
    # headless --debug_depth_gen / --debug_depth_filter dumps
    # (/root/reference/eval.py:61-74)
    gen_dbg = os.path.join(outdir, "acq", "debug_depth_gen")
    assert os.path.exists(os.path.join(gen_dbg, "input_view0000.png"))
    assert os.path.exists(os.path.join(gen_dbg, "depth_est_view0000.png"))
    assert os.path.exists(os.path.join(gen_dbg, "cloud_view0000.ply"))
    assert os.path.exists(os.path.join(gen_dbg, "cloud_allviews.ply"))
    filt_dbg = os.path.join(out_scan, "debug_depth_filter")
    assert os.path.exists(os.path.join(filt_dbg, "00000000_ref_depth.png"))
    assert os.path.exists(os.path.join(filt_dbg, "00000000_cloud.ply"))
    assert os.path.exists(os.path.join(filt_dbg, "fused_cloud.ply"))
    from scene_3dreconstruction_mvsnet_tpu.io.ply import read_ply

    pts, cols = read_ply(ply)
    assert pts.shape[0] > 0
    # depth maps at 1/4 image res
    from scene_3dreconstruction_mvsnet_tpu.io.pfm import read_pfm

    d, _ = read_pfm(os.path.join(out_scan, "depth_est/00000000.pfm"))
    assert d.shape == (16, 24)


@pytest.mark.slow
def test_save_depth_batched_matches_single(tmp_path):
    """Stage A with batch_size=2 (incl. a padded trailing batch over 3
    views) must write depth/confidence PFMs matching batch_size=1 to float
    reassociation tolerance (ops/plane_sweep.py batched dispatch +
    eval/depth_gen.py padding; XLA reduction order differs per batch
    shape, so bytes may differ at the ulp level)."""
    import jax
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        make_eval_tree,
        write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.eval import save_depth
    from scene_3dreconstruction_mvsnet_tpu.io.pfm import read_pfm
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet

    root = tmp_path / "acq"
    rig = SyntheticRig(n_views=3, img_hw=(64, 96), baseline=3.0)
    make_eval_tree(str(root), scan="scan1", rig=rig, ndepths=16)
    write_scan_list(str(root / "test.txt"), ["scan1"])

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    kw = dict(
        dataset="dataloader_eval", dataset_name="bds8",
        testpath=str(root), testlist=str(root / "test.txt"),
        NviewGen=3, numdepth=16, interval_scale=1.0,
        cam_subfolder="Cameras",
        img_subfolder="Rectified/{}/rect_C{:0>3}_L00.png",
        img_res=(64, 96), num_workers=0,
    )
    save_depth(model, variables, outdir=str(tmp_path / "b1"), **kw)
    save_depth(model, variables, outdir=str(tmp_path / "b2"), batch_size=2, **kw)

    for v in range(3):
        for sub in ("depth_est", "confidence"):
            a, _ = read_pfm(str(tmp_path / "b1" / "acq" / "scan1" / sub / f"{v:0>8}.pfm"))
            b, _ = read_pfm(str(tmp_path / "b2" / "acq" / "scan1" / sub / f"{v:0>8}.pfm"))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_save_depth_data_shards_matches_single(tmp_path):
    """Multi-device stage A (save_depth data_shards=4 on the virtual CPU
    mesh, the eval.py --data_shards surface) must write the same PFMs as
    the single-device run — the library-level e2e for VERDICT r3 item 6."""
    import jax
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        make_eval_tree,
        write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.eval import save_depth
    from scene_3dreconstruction_mvsnet_tpu.io.pfm import read_pfm
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet

    assert jax.device_count() >= 4
    root = tmp_path / "acq"
    rig = SyntheticRig(n_views=4, img_hw=(64, 96), baseline=3.0)
    make_eval_tree(str(root), scan="scan1", rig=rig, ndepths=16)
    write_scan_list(str(root / "test.txt"), ["scan1"])

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    kw = dict(
        dataset="dataloader_eval", dataset_name="bds8",
        testpath=str(root), testlist=str(root / "test.txt"),
        NviewGen=3, numdepth=16, interval_scale=1.0,
        cam_subfolder="Cameras",
        img_subfolder="Rectified/{}/rect_C{:0>3}_L00.png",
        img_res=(64, 96), num_workers=0,
    )
    save_depth(model, variables, outdir=str(tmp_path / "single"), **kw)
    save_depth(model, variables, outdir=str(tmp_path / "sharded"),
               batch_size=4, data_shards=4, **kw)

    for v in range(4):
        for sub in ("depth_est", "confidence"):
            a, _ = read_pfm(
                str(tmp_path / "single" / "acq" / "scan1" / sub / f"{v:0>8}.pfm"))
            b, _ = read_pfm(
                str(tmp_path / "sharded" / "acq" / "scan1" / sub / f"{v:0>8}.pfm"))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_auto_depth_chunk():
    """Stage A must bound the XLA sweep/fallback warp footprint: at the
    DTU-full eval res the lax.cond fallback branch's full-D buffers are
    ~34 GB and OOM 16 GB HBM even when the Pallas branch executes
    (observed live on a v5e; XLA charges the max over cond branches)."""
    from scene_3dreconstruction_mvsnet_tpu.eval.depth_gen import auto_depth_chunk

    # DTU-full 864x1152 D192: footprint budget forces chunking; the chunk
    # divides D and its buffer stays within ~budget_elems
    dc = auto_depth_chunk((864, 1152), 192)
    assert dc is not None and 192 % dc == 0
    assert dc * 216 * 288 * 32 <= 100_000_000 + 216 * 288 * 32
    # matches the hand-tuned bench.py value at this shape
    assert dc == 48
    # legacy DTU eval res (1184x1600 after the x32 crop)
    dc = auto_depth_chunk((1200, 1600), 192)
    assert dc is not None and 192 % dc == 0
    # 512x640 D192 chunks in half (protects batched stage A as well)
    assert auto_depth_chunk((512, 640), 192) == 96
    # the footprint scales with batch: bs2 halves the chunk
    assert auto_depth_chunk((512, 640), 192, batch_size=2) == 64
    assert auto_depth_chunk((864, 1152), 192, batch_size=2) == 24
    # small/test shapes are untouched
    assert auto_depth_chunk((128, 160), 96) is None
    assert auto_depth_chunk((256, 320), 192) is None


def test_infer_step_u8_matches_f32():
    """u8 transfer packing: images that are exactly u8/255 may ship as u8
    (4x less host->device bandwidth through the TPU tunnel); the jitted
    infer step normalizes on device. Outputs match the f32 path to float
    rounding (XLA fuses the on-device /255 into the first conv, so the
    division's rounding context differs — observed max delta ~1e-7)."""
    import jax
    import jax.numpy as jnp

    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train.state import make_infer_step

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (1, 2, 64, 96, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    proj = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    proj = proj + rng.rand(1, 2, 4, 4).astype(np.float32) * 1e-3
    dv = np.linspace(1.0, 2.0, 16, dtype=np.float32)[None]

    model = MVSNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(f32),
                           jnp.asarray(proj), jnp.asarray(dv))
    infer = make_infer_step(model)
    out_f32 = infer(variables, jnp.asarray(f32), jnp.asarray(proj),
                    jnp.asarray(dv))
    out_u8 = infer(variables, jnp.asarray(u8), jnp.asarray(proj),
                   jnp.asarray(dv))
    np.testing.assert_allclose(np.asarray(out_f32["depth"]),
                               np.asarray(out_u8["depth"]),
                               rtol=0, atol=1e-5)


def test_pack_u8_exactness_gate():
    """_pack_u8 ships exactly-u8/255 batches as u8 and leaves genuinely
    float-valued images (e.g. a custom dataset's own normalization) on f32."""
    from scene_3dreconstruction_mvsnet_tpu.eval.depth_gen import _pack_u8 as pack

    exact = {"imgs": (np.arange(48).reshape(1, 1, 4, 4, 3) % 256)
             .astype(np.float32) / 255.0}
    out = pack(dict(exact))
    assert out["imgs_dev"].dtype == np.uint8
    np.testing.assert_array_equal(
        out["imgs_dev"].astype(np.float32) / 255.0, exact["imgs"])

    inexact = {"imgs": np.full((1, 1, 4, 4, 3), 0.3333, np.float32)}
    out = pack(dict(inexact))
    assert "imgs_dev" not in out


def test_device_image_store_lru():
    """_DeviceImageStore uploads each (scan, view) once, serves hits from
    the cache, and LRU-evicts past its byte budget."""
    from scene_3dreconstruction_mvsnet_tpu.eval.depth_gen import _DeviceImageStore

    img = (np.arange(4 * 6 * 3) % 256).reshape(4, 6, 3).astype(np.uint8)
    store = _DeviceImageStore(budget_bytes=3 * img.nbytes)
    a = store.get(("s", 0), img)
    assert store.uploads == 1
    assert store.get(("s", 0), img) is a  # hit: same device buffer
    assert store.uploads == 1
    store.get(("s", 1), img + 1)
    store.get(("s", 2), img + 2)
    assert store.uploads == 3
    store.get(("s", 3), img + 3)  # over budget: evicts LRU ("s", 0)
    assert ("s", 0) not in store._entries and ("s", 1) in store._entries
    b = store.get(("s", 0), img)  # re-upload after eviction
    assert store.uploads == 5 and b is not a
    np.testing.assert_array_equal(np.asarray(b), img)

    # gather keys every slot of a batch and respects missing u8 pack
    sample = {
        "imgs_dev": np.stack([np.stack([img, img + 1])]),
        "view_ids": np.array([[7, 8]], np.int32),
        "scan": ["scanX"],
    }
    out = store.gather(sample, 1)
    assert len(out) == 2 and store.uploads == 7
    assert store.gather({"view_ids": sample["view_ids"]}, 1) is None


@pytest.mark.slow
def test_save_depth_device_store_matches_plain(tmp_path):
    """Stage A with the device-resident image store (batch_size=2 incl. a
    padded trailing batch) must write depth/confidence PFMs matching the
    store-disabled path: the store only changes WHERE the u8->f32 images
    come from (device gather of per-view uploads vs per-batch host copy)."""
    import jax
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        make_eval_tree,
        write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.eval import save_depth
    from scene_3dreconstruction_mvsnet_tpu.io.pfm import read_pfm
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet

    root = tmp_path / "acq"
    rig = SyntheticRig(n_views=3, img_hw=(64, 96), baseline=3.0)
    make_eval_tree(str(root), scan="scan1", rig=rig, ndepths=16)
    write_scan_list(str(root / "test.txt"), ["scan1"])

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    kw = dict(
        dataset="dataloader_eval", dataset_name="bds8",
        testpath=str(root), testlist=str(root / "test.txt"),
        NviewGen=3, numdepth=16, interval_scale=1.0,
        cam_subfolder="Cameras",
        img_subfolder="Rectified/{}/rect_C{:0>3}_L00.png",
        img_res=(64, 96), num_workers=0, batch_size=2,
    )
    plain = save_depth(model, variables, outdir=str(tmp_path / "plain"),
                       device_img_store=False, **kw)
    stored = save_depth(model, variables, outdir=str(tmp_path / "stored"), **kw)
    assert plain["store_uploads"] == 0
    # 3 views x 3 slots = 9 slot uses, but only 3 unique images uploaded
    assert stored["store_uploads"] == 3

    for v in range(3):
        for sub in ("depth_est", "confidence"):
            a, _ = read_pfm(str(tmp_path / "plain" / "acq" / "scan1" / sub / f"{v:0>8}.pfm"))
            b, _ = read_pfm(str(tmp_path / "stored" / "acq" / "scan1" / sub / f"{v:0>8}.pfm"))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_pack_u8_keyed_cache():
    """With view identity present, _pack_u8 memoizes the rint + exactness
    check per (scan, view) — each image recurs in ~NviewGen batches — and
    an inexact image (cached as None) keeps its batches on the f32 path."""
    from scene_3dreconstruction_mvsnet_tpu.eval.depth_gen import _pack_u8 as pack

    img0 = (np.arange(48).reshape(4, 4, 3) % 256).astype(np.float32) / 255.0
    img1 = ((np.arange(48).reshape(4, 4, 3) + 7) % 256).astype(np.float32) / 255.0
    cache: dict = {}
    batch = {
        "imgs": np.stack([np.stack([img0, img1])]),
        "view_ids": np.array([[0, 1]], np.int32),
        "scan": ["s1"],
    }
    out = pack(dict(batch), cache=cache)
    assert out["imgs_dev"].dtype == np.uint8 and len(cache) == 2
    np.testing.assert_array_equal(
        out["imgs_dev"].astype(np.float32) / 255.0, batch["imgs"])
    # second batch reusing view 1 hits the cache (same u8 buffer object)
    b2 = {"imgs": np.stack([np.stack([img1, img0])]),
          "view_ids": np.array([[1, 0]], np.int32), "scan": ["s1"]}
    out2 = pack(dict(b2), cache=cache)
    assert out2["imgs_dev"].base is not None or len(cache) == 2

    # inexact image poisons only batches containing it
    bad = np.full((4, 4, 3), 0.3333, np.float32)
    b3 = {"imgs": np.stack([np.stack([img0, bad])]),
          "view_ids": np.array([[0, 9]], np.int32), "scan": ["s1"]}
    out3 = pack(dict(b3), cache=cache)
    assert "imgs_dev" not in out3 and cache[("s1", 9)] is None


@pytest.mark.slow
def test_eval_cli_overlap_filter_two_scans(tmp_path):
    """Overlapped stage B (each scan filtered as its depth maps finish,
    concurrent with stage A of later scans) must produce byte-identical
    PLYs and masks to the strictly-sequential --no_overlap_filter path."""
    import jax
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        make_eval_tree,
        write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train import (
        TrainState,
        make_optimizer,
        save_checkpoint,
    )

    root = tmp_path / "acq"
    rig = SyntheticRig(n_views=3, img_hw=(64, 96), baseline=3.0)
    make_eval_tree(str(root), scan="scan1", rig=rig, ndepths=16)
    make_eval_tree(str(root), scan="scan2", rig=rig, ndepths=16)
    write_scan_list(str(root / "test.txt"), ["scan1", "scan2"])

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    state = TrainState.create(variables, make_optimizer(lambda s: 1e-3))
    ckpt_dir = save_checkpoint(str(tmp_path / "log"), 0, state)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(outdir, extra):
        cmd = [
            sys.executable, os.path.join(repo, "eval.py"),
            "--dataset", "dataloader_eval", "--dataset_name", "bds8",
            "--testpath", str(root), "--testlist", str(root / "test.txt"),
            "--loadckpt", ckpt_dir, "--outdir", outdir,
            "--NviewGen", "3", "--NviewFilter", "3", "--numdepth", "16",
            "--interval_scale", "1.0", "--photomask", "0.0",
            "--geomask", "1", "--condmask_pixel", "6.0",
            "--condmask_depth", "0.5", "--save_ply", "--num_workers", "0",
            "--img_res", "64", "96", "--cam_subfolder", "Cameras",
            "--img_subfolder", "Rectified/{}/rect_C{:0>3}_L00.png",
        ] + extra
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=900)
        assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    run(str(tmp_path / "ovl"), [])
    run(str(tmp_path / "seq"), ["--no_overlap_filter"])

    for scan_id, scan in (("001", "scan1"), ("002", "scan2")):
        a = (tmp_path / "ovl" / "acq" / f"mvsnet{scan_id}_l3.ply").read_bytes()
        b = (tmp_path / "seq" / "acq" / f"mvsnet{scan_id}_l3.ply").read_bytes()
        assert a == b
        for v in range(3):
            for kind in ("photo", "geo", "final"):
                pa = tmp_path / "ovl" / "acq" / scan / "mask" / f"{v:0>8}_{kind}.png"
                pb = tmp_path / "seq" / "acq" / scan / "mask" / f"{v:0>8}_{kind}.png"
                assert pa.read_bytes() == pb.read_bytes()


@pytest.mark.slow
def test_eval_cli_serve_matches_batch(tmp_path):
    """eval.py --serve (scan requests streamed over stdin into ONE warm
    process, save_depth session reuse) must produce byte-identical PLYs and
    masks to the batch --testlist run of the same two scans."""
    import jax
    from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (
        make_eval_tree,
        write_scan_list,
    )
    from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
    from scene_3dreconstruction_mvsnet_tpu.train import (
        TrainState,
        make_optimizer,
        save_checkpoint,
    )

    root = tmp_path / "acq"
    rig = SyntheticRig(n_views=3, img_hw=(64, 96), baseline=3.0)
    make_eval_tree(str(root), scan="scan1", rig=rig, ndepths=16)
    make_eval_tree(str(root), scan="scan2", rig=rig, ndepths=16)
    write_scan_list(str(root / "test.txt"), ["scan1", "scan2"])

    model = MVSNet()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 96, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        jnp.linspace(1.0, 2.0, 16)[None],
    )
    state = TrainState.create(variables, make_optimizer(lambda s: 1e-3))
    ckpt_dir = save_checkpoint(str(tmp_path / "log"), 0, state)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    base = [
        sys.executable, os.path.join(repo, "eval.py"),
        "--dataset", "dataloader_eval", "--dataset_name", "bds8",
        "--testpath", str(root), "--loadckpt", ckpt_dir,
        "--NviewGen", "3", "--NviewFilter", "3", "--numdepth", "16",
        "--interval_scale", "1.0", "--photomask", "0.0",
        "--geomask", "1", "--condmask_pixel", "6.0",
        "--condmask_depth", "0.5", "--save_ply", "--num_workers", "0",
        "--img_res", "64", "96", "--cam_subfolder", "Cameras",
        "--img_subfolder", "Rectified/{}/rect_C{:0>3}_L00.png",
    ]
    proc = subprocess.run(
        base + ["--testlist", str(root / "test.txt"),
                "--outdir", str(tmp_path / "batch")],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    proc = subprocess.run(
        base + ["--serve", "--outdir", str(tmp_path / "serve")],
        input="scan1\nscan2\nquit\n",
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "SERVED scan1" in proc.stdout and "SERVED scan2" in proc.stdout
    assert "views_per_s_sustained" in proc.stdout
    # warm-state reuse across requests: the infer step compiles once (the
    # second request must reuse the session's jitted fn, not re-jit)
    assert proc.stdout.count("SERVE ready") == 1

    for scan_id, scan in (("001", "scan1"), ("002", "scan2")):
        a = (tmp_path / "batch" / "acq" / f"mvsnet{scan_id}_l3.ply").read_bytes()
        b = (tmp_path / "serve" / "acq" / f"mvsnet{scan_id}_l3.ply").read_bytes()
        assert a == b
        for v in range(3):
            for kind in ("photo", "geo", "final"):
                pa = tmp_path / "batch" / "acq" / scan / "mask" / f"{v:0>8}_{kind}.png"
                pb = tmp_path / "serve" / "acq" / scan / "mask" / f"{v:0>8}_{kind}.png"
                assert pa.read_bytes() == pb.read_bytes()
