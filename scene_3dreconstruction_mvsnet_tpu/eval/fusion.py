"""Eval stage B: filter saved depth maps and fuse into a point cloud.

TPU equivalent of filter_depth (/root/reference/eval.py:590-843): for each
reference view, read back the stage-A outputs, run the (on-device)
photometric + geometric filter, write the three mask PNGs, back-project the
fused depths to world points with the reference's empirical 1.0531 x/y
scale, and export a binary PLY (fixing the reference's --save_ply crash,
/root/reference/eval.py:796).
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from ..geometry.transforms import depth_to_world_points
from ..io.cams import read_camera_parameters, read_pair_file
from ..io.images import read_img, save_mask
from ..io.pfm import read_pfm
from ..io.ply import write_ply
from .filtering import fuse_scan


def filter_depth(
    dataset_folder: str,
    scan: str,
    out_folder: str,
    plyfilename: str,
    *,
    outdir_acq: str,
    pairfile: str = "pair.txt",
    dataset_name: str = "dtu",
    NviewFilter: int = 10,
    photomask: float = 0.8,
    geomask: int = 3,
    condmask_pixel: float = 1.0,
    condmask_depth: float = 0.01,
    save_ply: bool = False,
    xy_scale: float = 1.0531,
    postprocess: bool = False,
    voxel_size: float = 5.0,
    debug_depth_filter: int = 0,
    aot_cache: str | None = None,
) -> dict:
    """Filter + fuse one scan. Returns stats incl. per-view timing and mask
    coverage. File layout matches the reference so outputs are drop-in
    comparable.

    ``debug_depth_filter`` mirrors the reference bitmask
    (/root/reference/eval.py:69-74) with headless dumps under
    ``<out_folder>/debug_depth_filter/``: bit 0 per-view depth + mask PNGs
    (:723-760), bit 1 per-view filtered cloud PLY (:762-780), bit 2 fused
    all-views cloud PLY (:805-830)."""
    print(f"============ DEPTH MAPS FILTER / FUSION using {NviewFilter} views")
    from ..utils.misc import get_powers

    filter_bits = set(get_powers(debug_depth_filter))
    debug_dir = os.path.join(out_folder, "debug_depth_filter")

    if dataset_name == "bin":
        pair_file = os.path.join(dataset_folder, "../..", pairfile)
    else:
        pair_file = os.path.join(dataset_folder, pairfile)
    pair_data = read_pair_file(pair_file)

    vertices, vertex_colors = [], []
    filter_times, coverage = [], []

    def cam_path(view):
        return os.path.join(outdir_acq, scan, "cams", f"00000{view:0>3}_cam.txt")

    # Read every view's files ONCE (the reference re-reads each source view's
    # depth map for every reference view it supports), then run the whole
    # scan's photometric + geometric filter in a single device launch.
    t_load0 = time.time()
    view_ids = sorted({v for r, s in pair_data for v in [r] + list(s)})
    depths, confs, Ks, Es = [], [], [], []
    for v in view_ids:
        K, E = read_camera_parameters(cam_path(v))
        Ks.append(K)
        Es.append(E)
        depths.append(read_pfm(os.path.join(out_folder, f"depth_est/{v:0>8}.pfm"))[0])
        confs.append(read_pfm(os.path.join(out_folder, f"confidence/{v:0>8}.pfm"))[0])
    depths = np.stack(depths)
    confs = np.stack(confs)
    Ks = np.stack(Ks)
    Es = np.stack(Es)
    t_load = time.time() - t_load0

    t_fuse0 = time.time()
    results = fuse_scan(
        depths, confs, Ks, Es, pair_data, view_ids,
        NviewFilter=NviewFilter,
        photomask=photomask,
        geomask=geomask,
        condmask_pixel=condmask_pixel,
        condmask_depth=condmask_depth,
        aot_cache=aot_cache,
    )
    t_fuse = time.time() - t_fuse0
    print(
        f"scan filter: {len(pair_data)} ref views in one launch — "
        f"load {t_load:.3f}s, device+fetch {t_fuse:.3f}s"
    )

    # Per-ref-view emit, parallel over a small thread pool: the heavy parts
    # (artifact PNG decode at full res, ~0.15 s/view at DTU-full, and the
    # back-projection's device round trip) release the GIL, so 4 threads
    # overlap decode with device work. Results are consumed IN PAIR ORDER so
    # the PLY vertex order (and the printed summaries) match the serial
    # reference loop byte for byte.
    def _process_ref(i: int):
        ref_view, _ = pair_data[i]
        result = results[i]
        t0 = time.time()
        row = view_ids.index(ref_view)
        ref_intrinsics, ref_extrinsics = Ks[row], Es[row]
        ref_depth = depths[row]
        ref_img = read_img(
            os.path.join(outdir_acq, scan, "images", f"00000{ref_view:0>3}.png")
        )
        h_i, w_i = ref_img.shape[:2]
        h_d, w_d = ref_depth.shape[:2]
        assert (h_i, w_i) == (4 * h_d, 4 * w_d), "incompatible depth/image dims"

        photo_mask = result["photo_mask"]
        geo_mask = result["geo_mask"]
        final_mask = result["final_mask"]

        mask_dir = os.path.join(out_folder, "mask")
        os.makedirs(mask_dir, exist_ok=True)
        save_mask(os.path.join(mask_dir, f"{ref_view:0>8}_photo.png"), photo_mask)
        save_mask(os.path.join(mask_dir, f"{ref_view:0>8}_geo.png"), geo_mask)
        save_mask(os.path.join(mask_dir, f"{ref_view:0>8}_final.png"), final_mask)

        # back-project fused depths to world points; sample colors at the
        # depth-resolution pixel centers (img[1::4, 1::4],
        # /root/reference/eval.py:754)
        world = np.asarray(
            depth_to_world_points(
                jnp.asarray(result["depth_est_averaged"]),
                jnp.asarray(ref_intrinsics),
                jnp.asarray(ref_extrinsics),
                xy_scale=xy_scale,
            )
        )
        flat_mask = final_mask.reshape(-1)
        verts = world[flat_mask]
        colors = ref_img[1::4, 1::4, :][final_mask]
        cols = (colors * 255).astype(np.uint8)

        if filter_bits:
            os.makedirs(debug_dir, exist_ok=True)
            from ..io.images import save_image_u8

            if "0" in filter_bits:
                # per-view depth/mask panels (/root/reference/eval.py:723-760)
                rng_lo, rng_hi = float(ref_depth.min()), float(ref_depth.max())
                span = max(rng_hi - rng_lo, 1e-6)

                def norm(x):
                    return np.clip((x - rng_lo) / span, 0, 1)

                save_image_u8(
                    os.path.join(debug_dir, f"{ref_view:0>8}_ref_depth.png"),
                    norm(ref_depth),
                )
                save_image_u8(
                    os.path.join(debug_dir, f"{ref_view:0>8}_depth_photo.png"),
                    norm(ref_depth * photo_mask),
                )
                save_image_u8(
                    os.path.join(debug_dir, f"{ref_view:0>8}_depth_geo.png"),
                    norm(ref_depth * geo_mask),
                )
                save_image_u8(
                    os.path.join(debug_dir, f"{ref_view:0>8}_depth_final.png"),
                    norm(result["depth_est_averaged"] * final_mask),
                )
            if "1" in filter_bits:
                write_ply(
                    os.path.join(debug_dir, f"{ref_view:0>8}_cloud.ply"),
                    verts, cols,
                )
        cov = (photo_mask.mean(), geo_mask.mean(), final_mask.mean())
        return verts, cols, cov, ref_view, time.time() - t0

    if pair_data:
        # warm the back-projection jit once so pool threads don't race the
        # first compile
        _ = depth_to_world_points(
            jnp.asarray(results[0]["depth_est_averaged"]),
            jnp.asarray(Ks[view_ids.index(pair_data[0][0])]),
            jnp.asarray(Es[view_ids.index(pair_data[0][0])]),
            xy_scale=xy_scale,
        )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        emitted = list(pool.map(_process_ref, range(len(pair_data))))
    for verts, cols, cov, ref_view, dt in emitted:
        vertices.append(verts)
        vertex_colors.append(cols)
        filter_times.append(dt)
        coverage.append(cov)
        print(
            "SUMMARY: Ref_view: {:0>2}, photo/geo/final-mask:"
            "{:.2f}%/{:.2f}%/{:.2f}%, time={:.3f}s".format(
                ref_view, cov[0] * 100, cov[1] * 100, cov[2] * 100, dt,
            )
        )

    vertices_all = (
        np.concatenate(vertices, axis=0) if vertices else np.zeros((0, 3), np.float32)
    )
    colors_all = (
        np.concatenate(vertex_colors, axis=0)
        if vertex_colors
        else np.zeros((0, 3), np.uint8)
    )
    if save_ply:
        write_ply(plyfilename, vertices_all, colors_all)
        print("saving the final model to", plyfilename)
    if "2" in filter_bits and vertices_all.shape[0]:
        os.makedirs(debug_dir, exist_ok=True)
        write_ply(
            os.path.join(debug_dir, "fused_cloud.ply"), vertices_all, colors_all
        )

    if postprocess and vertices_all.shape[0]:
        # reference post-processing for non-DTU rigs: crop to the outer bin
        # bbox, statistical outlier removal, 5 mm voxel downsample, write
        # scaled by 0.01 (/root/reference/eval.py:832-839)
        from .scene_kit import get_frame_bbox, postprocess_cloud

        _, outer = get_frame_bbox(context=outdir_acq)
        pts, cols = postprocess_cloud(
            vertices_all, colors_all,
            crop_bbox=None if dataset_name == "dtu" else outer,
            voxel_size=voxel_size,
        )
        pcd_fname = os.path.join(out_folder, f"fused_dwnsmpld_{int(voxel_size)}mm.ply")
        write_ply(pcd_fname, pts * 0.01, cols)
        print("saving model to", pcd_fname)

    avg_time = float(np.mean(filter_times)) if filter_times else 0.0
    print(f"Averaged filter time: {avg_time}")
    return {
        "avg_filter_time": avg_time,
        "n_ref_views": len(filter_times),
        "n_points": int(vertices_all.shape[0]),
        "coverage": coverage,
        "vertices": vertices_all,
        "colors": colors_all,
    }
