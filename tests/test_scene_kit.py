"""Scene-kit tests: bbox presets, camera poses, voxel downsample, outlier
removal, and the post-processing pipeline."""

import numpy as np

from scene_3dreconstruction_mvsnet_tpu.eval import (
    camera_poses,
    get_frame_bbox,
    postprocess_cloud,
    remove_statistical_outliers,
    voxel_down_sample,
)


def test_bbox_presets():
    inner, outer = get_frame_bbox()
    # mm scale, z starts at 0
    np.testing.assert_allclose(inner.min_bound[2], 0.0)
    np.testing.assert_allclose(inner.max_bound - inner.min_bound, [570, 370, 220])
    # outer adds 20 mm walls, but not above the bin opening
    np.testing.assert_allclose(outer.min_bound, inner.min_bound - 20)
    np.testing.assert_allclose(outer.max_bound[:2], inner.max_bound[:2] + 20)
    np.testing.assert_allclose(outer.max_bound[2], inner.max_bound[2])

    inner2, _ = get_frame_bbox(context="acq_overhead03_x")
    np.testing.assert_allclose(
        (inner2.min_bound + inner2.max_bound)[:2] / 2, [80.0, 30.0]
    )

    assert inner.contains(np.array([[0.0, 0.0, 10.0]]))[0]
    assert not inner.contains(np.array([[1000.0, 0.0, 10.0]]))[0]


def test_camera_poses():
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [1.0, 2.0, 3.0]  # world->cam translation
    cams = camera_poses([E])
    # camera center = -R^T t
    np.testing.assert_allclose(cams[0]["center"], [-1.0, -2.0, -3.0], atol=1e-6)
    np.testing.assert_allclose(cams[0]["direction"], [0, 0, 1], atol=1e-6)
    assert cams[0]["highlight"]


def test_voxel_down_sample(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [10.0, 10.0, 10.0]])
    cols = np.array([[0, 0, 0], [255, 255, 255], [100, 100, 100]], np.uint8)
    out, oc = voxel_down_sample(pts, cols, voxel_size=1.0)
    assert out.shape == (2, 3)
    # the two near points merge to their mean
    merged = out[np.argmin(np.linalg.norm(out, axis=1))]
    np.testing.assert_allclose(merged, [0.15, 0.15, 0.15], atol=1e-6)


def test_outlier_removal(rng):
    cluster = rng.randn(500, 3)
    outliers = np.array([[50.0, 50.0, 50.0], [-60.0, 0.0, 0.0]])
    pts = np.vstack([cluster, outliers])
    keep = remove_statistical_outliers(pts, nb_neighbors=10, std_ratio=2.0)
    assert not keep[-1] and not keep[-2], "far outliers must be removed"
    assert keep[:500].mean() > 0.9, "the dense cluster must survive"


def test_postprocess_cloud(rng):
    inner, outer = get_frame_bbox()
    inside = rng.rand(2000, 3) * [500, 300, 200] + [-250, -150, 5]
    far = rng.rand(50, 3) * 100 + 3000
    pts = np.vstack([inside, far]).astype(np.float32)
    cols = np.full((pts.shape[0], 3), 128, np.uint8)
    out, oc = postprocess_cloud(pts, cols, crop_bbox=outer, voxel_size=20.0)
    assert out.shape[0] > 0
    assert outer.contains(out.astype(np.float64)).all()
    assert oc.shape[0] == out.shape[0]
