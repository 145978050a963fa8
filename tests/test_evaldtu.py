"""Legacy evalDTU.py driver + dtu_yao_eval dataset coverage.

The legacy surface deliberately differs from eval.py
(/root/reference/evalDTU.py): stage B divides intrinsics by 4 at filter
time, colors come from the raw image subsampled [0::4, 0::4], the
back-projection uses the integer-corner pixel grid with NO empirical
1.0531 x/y scale, and a PLY is always written. These tests pin exactly
those quirks on an analytic-plane rig (fabricated stage-A PFMs; the
stage-A model forward at the 1184x1600 legacy res is compile-heavy on CPU
and is covered by the shared make_infer_step tests at smaller shapes).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scene_3dreconstruction_mvsnet_tpu.data.synthetic import (  # noqa: E402
    SyntheticRig,
    make_legacy_dtu_eval_tree,
)


def _legacy_rig():
    return SyntheticRig(n_views=3, img_hw=(1200, 1600), z0=500.0,
                        slope_x=0.1, baseline=25.0, focal=1100.0)


def test_legacy_dataset_semantics(tmp_path):
    """dtu_yao_eval parity knobs (/root/reference/datasets/dtu_yao_eval.py):
    1200x1600 asserted and bottom-16-row crop, intrinsics /4 at cam read,
    1-indexed image filenames, depth endpoint (ndepths - 0.5)."""
    from scene_3dreconstruction_mvsnet_tpu.data import find_dataset_def

    root = tmp_path / "dtu"
    rig = make_legacy_dtu_eval_tree(str(root), scan="scan9", rig=_legacy_rig(),
                                    ndepths=8)
    (root / "list.txt").write_text("scan9\n")

    DS = find_dataset_def("dtu_yao_eval")
    ds = DS(str(root), str(root / "list.txt"), "test", 2, ndepths=8,
            interval_scale=1.0)
    assert len(ds) == 3  # one meta per pair-file ref view
    s = ds[0]
    assert s["imgs"].shape == (2, 1184, 1600, 3)  # bottom 16 rows cropped
    assert s["depth_values"].shape == (8,)
    # endpoint convention: arange stops at interval * (ndepths - 0.5) + min
    lo, hi = rig.depth_range()
    margin = 0.15 * (hi - lo) + 1.0
    dmin = lo - margin
    dint = (hi - lo + 2 * margin) / 8
    np.testing.assert_allclose(
        s["depth_values"], dmin + dint * np.arange(8), rtol=1e-5)
    # proj composed from K/4: P[:3,:4] = (K/4) @ E[:3,:4]
    K4 = rig.K.copy()
    K4[:2, :] /= 4.0
    expect = K4 @ rig.extrinsics(0)[:3, :4]
    np.testing.assert_allclose(s["proj_matrices"][0][:3, :4], expect, rtol=1e-4)
    assert s["filename"] == "scan9/{}/00000000{}"


def test_evaldtu_filter_quirks(tmp_path):
    """evalDTU.filter_depth on fabricated ground-truth PFMs: masks + PLY
    written; back-projected points land on the analytic world plane
    z = z0 + slope_x * x WITHOUT the 1.0531 x/y scale (the unified eval
    applies it; the legacy driver must not — reference evalDTU.py:425-427);
    colors equal the [0::4, 0::4]-subsampled raw image."""
    # Load OUR evalDTU.py by explicit path: a bare `import evalDTU` resolves
    # to /root/reference/evalDTU.py if any earlier test left the reference
    # on sys.path (ordering-dependent open3d ModuleNotFoundError).
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "repo_evalDTU",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "evalDTU.py"),
    )
    evalDTU = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(evalDTU)
    from scene_3dreconstruction_mvsnet_tpu.io.pfm import save_pfm
    from scene_3dreconstruction_mvsnet_tpu.io.ply import read_ply

    rig = _legacy_rig()
    root = tmp_path / "dtu"
    make_legacy_dtu_eval_tree(str(root), scan="scan9", rig=rig, ndepths=8)

    h_d, w_d = 296, 400  # (1184/4, 1600/4): legacy stage-A output size
    out_folder = tmp_path / "out" / "dtu" / "scan9"
    for v in range(rig.n_views):
        depth = rig.depth_map(v, scale=4)[:h_d, :w_d]
        os.makedirs(out_folder / "depth_est", exist_ok=True)
        os.makedirs(out_folder / "confidence", exist_ok=True)
        save_pfm(str(out_folder / "depth_est" / f"{v:0>8}.pfm"), depth)
        save_pfm(str(out_folder / "confidence" / f"{v:0>8}.pfm"),
                 np.full((h_d, w_d), 0.9, np.float32))

    args = argparse.Namespace(
        NviewFilter=2, photomask=0.5, geomask=2, condmask_pixel=1.0,
        condmask_depth=0.01, pairfile="pair.txt",
    )
    ply = tmp_path / "out" / "dtu" / "mvsnet009_l3.ply"
    evalDTU.filter_depth(args, str(root), "scan9", str(out_folder), str(ply))

    for v in range(rig.n_views):
        for kind in ("photo", "geo", "final"):
            assert (out_folder / "mask" / f"{v:0>8}_{kind}.png").exists()
    assert ply.exists()  # always written (legacy quirk)

    pts, cols = read_ply(str(ply))
    assert pts.shape[0] > 0.9 * rig.n_views * h_d * w_d  # GT depths: near-full masks
    # analytic plane: z = z0 + slope_x * x in world coords. With the 1.0531
    # scale erroneously applied, x would be off by ~5% (hundreds of mm at
    # this rig) — this asserts the legacy no-scale back-projection.
    resid = pts[:, 2] - (rig.z0 + rig.slope_x * pts[:, 0])
    # f32 at z~500-700 mm quantizes to ~0.04 mm; the 1.0531 scale would be
    # a ~5% x error -> tens of mm of plane residual at this rig
    assert np.max(np.abs(resid)) < 0.5

    # colors: raw image subsampled [0::4, 0::4] then cropped to depth size
    from scene_3dreconstruction_mvsnet_tpu.io.images import read_img

    img0 = read_img(
        str(root / "Rectified_raw" / "scan9" / "rect_001_3_r5000.png")
    )[0::4, 0::4][:h_d, :w_d]
    expect0 = (img0.reshape(-1, 3) * 255).astype(np.uint8)
    # ref view 0 contributes the first mask.sum() vertices, in raster order
    from scene_3dreconstruction_mvsnet_tpu.io.images import read_mask

    m0 = read_mask(str(out_folder / "mask" / "00000000_final.png"))
    n0 = int(m0.sum())
    np.testing.assert_array_equal(cols[:n0], expect0[m0.reshape(-1)])
