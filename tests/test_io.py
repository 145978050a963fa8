"""IO codec tests: PFM round trips, cam/pair text round trips, image
preprocessing semantics, PLY round trip."""

import os

import numpy as np
import pytest
from PIL import Image

from scene_3dreconstruction_mvsnet_tpu.io import (
    read_pfm,
    save_pfm,
    read_cam_file,
    read_camera_parameters,
    write_cam,
    read_pair_file,
    read_rescale_crop_img,
    read_img,
    save_mask,
    read_mask,
)
from scene_3dreconstruction_mvsnet_tpu.io.cams import write_pair_file
from scene_3dreconstruction_mvsnet_tpu.io.ply import write_ply, read_ply


def test_pfm_roundtrip_gray(tmp_path, rng):
    img = rng.rand(37, 53).astype(np.float32)
    fname = str(tmp_path / "depth.pfm")
    save_pfm(fname, img, scale=1.0)
    out, scale = read_pfm(fname)
    np.testing.assert_array_equal(out, img)
    assert scale == 1.0


def test_pfm_roundtrip_color(tmp_path, rng):
    img = rng.rand(16, 24, 3).astype(np.float32)
    fname = str(tmp_path / "color.pfm")
    save_pfm(fname, img)
    out, _ = read_pfm(fname)
    np.testing.assert_array_equal(out, img)


def test_pfm_rejects_f64(tmp_path, rng):
    with pytest.raises(ValueError):
        save_pfm(str(tmp_path / "x.pfm"), rng.rand(4, 4))


def test_pfm_reference_compatible(tmp_path, rng):
    """Byte-compatibility with the reference codec: emulate its writer
    (header 'Pf', dims line, negative scale, bottom-up rows) and read back."""
    img = rng.rand(8, 6).astype(np.float32)
    fname = tmp_path / "ref.pfm"
    with open(fname, "wb") as f:
        f.write(b"Pf\n")
        f.write(b"6 8\n")
        f.write(b"-1.000000\n")
        np.flipud(img).astype("<f4").tofile(f)
    out, scale = read_pfm(str(fname))
    np.testing.assert_array_equal(out, img)
    assert scale == 1.0


def _write_cam_text(path, extr, intr, depth_min, depth_interval):
    lines = ["extrinsic"]
    lines += [" ".join(str(v) for v in row) for row in extr]
    lines += ["", "intrinsic"]
    lines += [" ".join(str(v) for v in row) for row in intr]
    lines += ["", f"{depth_min} {depth_interval}"]
    path.write_text("\n".join(lines) + "\n")


def test_read_cam_file(tmp_path, rng):
    extr = np.eye(4, dtype=np.float32)
    extr[:3, 3] = [1.5, -2.0, 3.25]
    intr = np.array([[361.5, 0, 82.9], [0, 361.5, 66.6], [0, 0, 1]], np.float32)
    _write_cam_text(tmp_path / "c.txt", extr, intr, 425.0, 2.5)
    K, E, dmin, dint = read_cam_file(str(tmp_path / "c.txt"), interval_scale=1.06)
    np.testing.assert_allclose(E, extr)
    np.testing.assert_allclose(K, intr)
    assert dmin == 425.0
    assert dint == pytest.approx(2.5 * 1.06)


def test_write_cam_roundtrip(tmp_path, rng):
    K = rng.rand(3, 3).astype(np.float32)
    R = rng.rand(4, 4).astype(np.float32)
    fname = str(tmp_path / "out_cam.txt")
    write_cam(fname, K, R, [425.0, 2.5, 192, 905.0])
    K2, R2 = read_camera_parameters(fname)
    np.testing.assert_allclose(K2, K, rtol=1e-6)
    np.testing.assert_allclose(R2, R, rtol=1e-6)
    K3, R3, dmin, dint = read_cam_file(fname)
    assert dmin == 425.0 and dint == 2.5


def test_pair_file_roundtrip(tmp_path):
    pairs = [(0, [10, 2, 9]), (1, [0, 3]), (7, [])]
    fname = str(tmp_path / "pair.txt")
    write_pair_file(fname, pairs)
    assert read_pair_file(fname) == pairs


def test_read_img_and_mask(tmp_path):
    arr = np.zeros((8, 10, 3), np.uint8)
    arr[2, 3] = 255
    Image.fromarray(arr).save(tmp_path / "img.png")
    img = read_img(str(tmp_path / "img.png"))
    assert img.dtype == np.float32
    assert img[2, 3, 0] == 1.0 and img[0, 0, 0] == 0.0

    mask = np.zeros((8, 10), bool)
    mask[1, 1] = True
    save_mask(str(tmp_path / "m.png"), mask)
    np.testing.assert_array_equal(read_mask(str(tmp_path / "m.png")), mask)


def test_rescale_crop_grayscale_stacking(tmp_path):
    """A 100x80 grayscale image targeted at (64, 64): scale = max(64/100,
    64/80) = 0.8 -> (80, 64); crop to (64, 64); 3-channel stack."""
    arr = (np.linspace(0, 255, 100 * 80).reshape(100, 80)).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(tmp_path / "bw.png")
    K = np.array([[100.0, 0, 40.0], [0, 100.0, 50.0], [0, 0, 1]], np.float32)
    img, K_out = read_rescale_crop_img(str(tmp_path / "bw.png"), K, img_res=(64, 64))
    assert img.shape == (64, 64, 3)
    np.testing.assert_array_equal(img[..., 0], img[..., 2])
    # fx scaled by 0.8; cy scaled then shifted by crop start (80-64)/2=8
    assert K_out[0, 0] == pytest.approx(80.0)
    assert K_out[1, 2] == pytest.approx(50.0 * 0.8 - 8.0)


def test_rescale_crop_rejects_upscale(tmp_path):
    Image.fromarray(np.zeros((10, 10), np.uint8)).save(tmp_path / "s.png")
    K = np.eye(3, dtype=np.float32)
    with pytest.raises(ValueError):
        read_rescale_crop_img(str(tmp_path / "s.png"), K, img_res=(64, 64))


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.randn(100, 3).astype(np.float32)
    cols = rng.randint(0, 256, (100, 3)).astype(np.uint8)
    fname = str(tmp_path / "cloud.ply")
    write_ply(fname, pts, cols)
    pts2, cols2 = read_ply(fname)
    np.testing.assert_array_equal(pts2, pts)
    np.testing.assert_array_equal(cols2, cols)


def test_cached_reads_thread_safe(tmp_path):
    """Concurrent loader THREADS decoding the same uncached image must not
    race on the cache publish: the eval pipeline runs num_workers threads in
    one process, so a pid-keyed tmp name is shared and the losing thread's
    os.replace raised FileNotFoundError (observed live in
    scripts/bench_e2e_eval.py with --num_workers 4)."""
    from concurrent.futures import ThreadPoolExecutor

    from scene_3dreconstruction_mvsnet_tpu.io.images import (
        read_img_cached,
        read_rescale_crop_img_cached,
    )

    arr = (np.arange(100 * 80) % 256).reshape(100, 80).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(tmp_path / "bw.png")
    cache = str(tmp_path / "cache")

    def hit_npz(_):
        K = np.array([[100.0, 0, 40.0], [0, 100.0, 50.0], [0, 0, 1]],
                     np.float32)
        img, K_out = read_rescale_crop_img_cached(
            str(tmp_path / "bw.png"), K, (64, 64), cache)
        return img, K_out

    def hit_npy(_):
        return read_img_cached(str(tmp_path / "bw.png"), cache)

    with ThreadPoolExecutor(max_workers=8) as ex:
        npz_results = list(ex.map(hit_npz, range(32)))
        npy_results = list(ex.map(hit_npy, range(32)))

    ref_img, ref_K = hit_npz(0)
    for img, K_out in npz_results:
        np.testing.assert_array_equal(img, ref_img)
        np.testing.assert_array_equal(K_out, ref_K)
    for img in npy_results:
        np.testing.assert_array_equal(img, hit_npy(0))
    # no leftover tmp files in the cache dir
    leftovers = [f for f in os.listdir(cache) if ".tmp." in f]
    assert leftovers == []
