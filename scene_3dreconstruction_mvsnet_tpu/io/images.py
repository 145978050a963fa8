"""Image loading and pre-processing for the MVS pipelines.

Covers the reference's image I/O surface: plain 0-1 float reads
(/root/reference/datasets/dtu_yao.py:64-68), binary masks
(/root/reference/eval.py:136-144), and the rescale + center-crop-to-x32 +
intrinsics-adjust preprocessing used by the unified eval loader
(/root/reference/datasets/data_io.py:76-154) including the grayscale->3ch
stacking for B&W bin-picking cameras.
"""

from __future__ import annotations

import math
import os

import numpy as np
from PIL import Image

BASE_IMAGE_SIZE = 32  # feature net downsamples x4; U-Net adds x8 => dims % 32 == 0


def read_img(filename: str) -> np.ndarray:
    """Read an image as float32 scaled to [0, 1]. Shape (H, W[, C])."""
    img = Image.open(filename)
    return np.asarray(img, dtype=np.float32) / 255.0


def read_img_cached(filename: str, cache_dir: str) -> np.ndarray:
    """`read_img` with a pre-decoded .npy cache.

    Multi-epoch training re-decodes the same PNGs every epoch; on this
    1-core host PNG decode is ~12x slower than np.load of the decoded f32
    array (scripts/profile_input.py). The cache key includes the source
    mtime, so edited files re-decode.
    """
    import hashlib
    import os

    st = os.stat(filename)
    key = hashlib.sha1(
        f"{os.path.abspath(filename)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()
    path = os.path.join(cache_dir, key + ".npy")
    if os.path.exists(path):
        return np.load(path)
    img = read_img(filename)
    os.makedirs(cache_dir, exist_ok=True)
    # atomic publish for concurrent loader THREADS as well as processes:
    # the tmp name must be unique per writer or two threads decoding the
    # same image share it and the loser's os.replace finds no source
    # (np.save appends .npy unless the name already ends with it)
    import threading

    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp.npy"
    np.save(tmp, img)
    os.replace(tmp, path)
    return img


# In-process LRU over read_rescale_crop_img_cached: eval stage A consumes
# each image ~NviewGen times per scan (ref once, src repeatedly), and even
# the warm .npz path re-reads ~60 MB/view from disk at DTU-full on this
# host. Entries are (img, adjusted_intrinsics) and are returned by
# REFERENCE — callers must not mutate. Guarded for loader threads.
_RAM_CACHE: dict = {}
_RAM_CACHE_BYTES = [0]
_RAM_CACHE_BUDGET = 768 << 20
import threading as _threading

_RAM_CACHE_LOCK = _threading.Lock()


def read_rescale_crop_img_cached(
    img_fname: str,
    intrinsics: np.ndarray,
    img_res: tuple[int, int],
    cache_dir: str,
    return_u8: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """``read_rescale_crop_img`` with an .npz cache of the rescaled/cropped
    image AND its adjusted intrinsics (keyed by source mtime + target res),
    so eval stage A skips both the PNG decode and the resize on re-runs.
    Hot entries are additionally served from a bounded in-process LRU.

    New entries are stored as **u8** (lossless: the /255 is the last step
    of the uncached path; 4x smaller cache and page-cache footprint) and
    converted to the requested form at load. Legacy f32 entries are served
    as-is (or rint'd back to u8 — exact, the f32 came from u8/255).

    ``intrinsics`` must be the unadjusted camera matrix; the cached adjusted
    matrix is copied into it (same in-place contract as the uncached path).
    """
    import hashlib

    st = os.stat(img_fname)
    key = hashlib.sha1(
        f"{os.path.abspath(img_fname)}|{st.st_mtime_ns}|{st.st_size}"
        f"|{tuple(img_res)}".encode()
    ).hexdigest()
    form_key = (key, bool(return_u8))

    with _RAM_CACHE_LOCK:
        hit = _RAM_CACHE.pop(form_key, None)
        if hit is not None:
            _RAM_CACHE[form_key] = hit  # re-insert: LRU order = dict order
            img, intr = hit
            intrinsics[:] = intr
            return img, intrinsics

    path = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(path):
        with np.load(path) as data:
            img, intr = data["img"], data["intrinsics"]
    else:
        img, intr = read_rescale_crop_img(
            img_fname, intrinsics.copy(), img_res, return_u8=True
        )
        os.makedirs(cache_dir, exist_ok=True)
        import threading

        tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp.npz"
        np.savez(tmp, img=img, intrinsics=intr)
        os.replace(tmp, path)

    img = np.asarray(img)
    if return_u8 and img.dtype != np.uint8:
        img = np.rint(img * 255.0).astype(np.uint8)  # legacy f32 entry
    elif not return_u8 and img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img.setflags(write=False)  # shared by reference across loader threads
    with _RAM_CACHE_LOCK:
        if form_key not in _RAM_CACHE:
            _RAM_CACHE[form_key] = (img, np.array(intr))
            _RAM_CACHE_BYTES[0] += img.nbytes
            while _RAM_CACHE_BYTES[0] > _RAM_CACHE_BUDGET and len(_RAM_CACHE) > 1:
                old_img, _ = _RAM_CACHE.pop(next(iter(_RAM_CACHE)))
                _RAM_CACHE_BYTES[0] -= old_img.nbytes
    intrinsics[:] = intr
    return img, intrinsics


def read_mask(filename: str) -> np.ndarray:
    """Read a binary mask: pixel > 0.5 after 0-1 scaling."""
    return read_img(filename) > 0.5


def save_mask(filename: str, mask: np.ndarray) -> None:
    """Save a boolean mask as an 8-bit PNG (255 = True)."""
    if mask.dtype != np.bool_:
        raise ValueError(f"mask dtype must be bool, got {mask.dtype}")
    Image.fromarray(mask.astype(np.uint8) * 255).save(filename)


def resize_img(img01: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Bilinear resize of a float [0,1] (or u8) image to (H, W) — the
    cv2.resize used for stage-A point-cloud color sampling
    (/root/reference/eval.py:435)."""
    h, w = hw
    img01 = np.asarray(img01)
    if img01.dtype == np.uint8:
        u8 = img01
    else:
        u8 = (np.clip(img01, 0.0, 1.0) * 255.0).astype(np.uint8)
    out = np.asarray(
        Image.fromarray(u8).resize((w, h), Image.BILINEAR), dtype=np.float32
    )
    return out / 255.0


def save_image_u8(filename: str, img01: np.ndarray) -> None:
    """Save a float [0,1] image (H,W[,C]) — or a ready u8 image — as an
    8-bit PNG. A u8 input is written as-is (the eval pipeline keeps images
    u8 end to end; this also avoids the truncation off-by-one the
    f32 roundtrip can introduce: (u8/255)*255 can land at 246.9999...).

    zlib level 1: the encode runs on the eval writer thread, where level 6
    cost ~100 ms per full-res view on this 1-core host (every host cycle
    is stolen from the loader); the artifacts are scratch outputs, not
    archives."""
    arr = np.asarray(img01)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    im = Image.fromarray(arr)
    if filename.endswith(".png"):
        im.save(filename, compress_level=1)
    else:
        im.save(filename)


def read_rescale_crop_img(
    img_fname: str,
    intrinsics: np.ndarray,
    img_res: tuple[int, int] = (512, 640),
    DEBUG: bool = False,
    return_u8: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Load an image, rescale to cover ``img_res``, center-crop to dimensions
    that are multiples of 32, and adjust ``intrinsics`` to match.

    ``return_u8`` skips the final /255 and returns the u8 pixels directly
    (PIL decodes and resizes in the u8 domain, so f32 output == u8/255
    exactly) — the eval pipeline keeps images u8 end to end, quartering
    host memcpy and transfer bytes.

    Matches /root/reference/datasets/data_io.py:76-154 step for step:
      1. resize so the larger relative scale wins (image covers the target),
      2. scale intrinsics rows 0-1 by the same factor,
      3. crop each dim either to the target (if the rescaled dim overshoots)
         or down to the next multiple of 32, centered,
      4. shift the principal point by the crop offset,
      5. grayscale inputs are stacked to 3 channels.

    ``intrinsics`` is modified in place (reference behavior) and also
    returned. Upscaling is rejected.
    """
    img = Image.open(img_fname)
    w_src, h_src = img.size  # PIL reports (width, height)

    h_target, w_target = img_res
    h_scale = float(h_target) / h_src
    w_scale = float(w_target) / w_src
    if h_scale > 1 or w_scale > 1:
        raise ValueError(
            f"{img_fname}: target {img_res} exceeds source ({h_src},{w_src}); "
            "image resolution can only be reduced"
        )
    resize_scale = max(h_scale, w_scale)

    img_rescaled = img.resize(
        (int(w_src * resize_scale), int(h_src * resize_scale)),
        resample=Image.BILINEAR,
    )
    w_rescaled, h_rescaled = img_rescaled.size

    intrinsics[:2, :] *= resize_scale

    final_h = (
        h_target
        if h_rescaled > h_target
        else int(math.floor(h_target / BASE_IMAGE_SIZE) * BASE_IMAGE_SIZE)
    )
    final_w = (
        w_target
        if w_rescaled > w_target
        else int(math.floor(w_target / BASE_IMAGE_SIZE) * BASE_IMAGE_SIZE)
    )

    start_h = int(math.floor((h_rescaled - final_h) / 2))
    start_w = int(math.floor((w_rescaled - final_w) / 2))
    img_cropped = img_rescaled.crop((start_w, start_h, start_w + final_w, start_h + final_h))

    intrinsics[0, -1] -= start_w
    intrinsics[1, -1] -= start_h

    if return_u8:
        np_img = np.asarray(img_cropped, dtype=np.uint8)
    else:
        np_img = np.asarray(img_cropped, dtype=np.float32) / 255.0
    if np_img.ndim == 2:  # B&W camera: replicate to 3 channels
        np_img = np.dstack((np_img, np_img, np_img))

    if DEBUG:
        print(
            f"[read_rescale_crop_img] {img_fname}: src=({h_src},{w_src}) "
            f"scale={resize_scale:.4f} crop=({start_h},{start_w})+"
            f"({final_h},{final_w}) out={np_img.shape}"
        )
    return np_img, intrinsics
