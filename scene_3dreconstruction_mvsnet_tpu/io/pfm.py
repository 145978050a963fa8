"""PFM (Portable Float Map) codec.

The PFM format stores float32 images bottom-up with a 3-line ASCII header:
  line 1: "PF" (3-channel color) or "Pf" (1-channel grayscale)
  line 2: "<width> <height>"
  line 3: scale factor; sign encodes endianness (negative => little-endian)

Behavioral parity target: the reference codec at
/root/reference/datasets/data_io.py:8-73 (vertical flip on both read and
write, endianness handling via the scale sign). Depth and confidence maps in
the eval pipeline are exchanged in this format, so round-trip fidelity is
load-bearing for output parity.
"""

from __future__ import annotations

import re
import sys

import numpy as np


def read_pfm(filename: str) -> tuple[np.ndarray, float]:
    """Read a PFM file. Returns (data, scale).

    data is float32, shape (H, W) for grayscale or (H, W, 3) for color,
    top-down row order (the file stores rows bottom-up; we flip).
    """
    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{filename}: not a PFM file (header {header!r})")

        dims = f.readline().decode("utf-8")
        m = re.match(r"^(\d+)\s(\d+)\s*$", dims)
        if m is None:
            raise ValueError(f"{filename}: malformed PFM dimensions line {dims!r}")
        width, height = int(m.group(1)), int(m.group(2))

        scale = float(f.readline().decode("utf-8").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)

        data = np.fromfile(f, dtype=endian + "f")

    shape = (height, width, 3) if color else (height, width)
    expected = height * width * (3 if color else 1)
    if data.size != expected:
        raise ValueError(
            f"{filename}: payload has {data.size} floats, expected {expected}"
        )
    data = np.flipud(data.reshape(shape))
    return data, scale


def save_pfm(filename: str, image: np.ndarray, scale: float = 1.0) -> None:
    """Write a float32 image as PFM (native little/big endian, auto-detected)."""
    image = np.asarray(image)
    if image.dtype != np.float32:
        raise ValueError(f"PFM image dtype must be float32, got {image.dtype}")

    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
    else:
        raise ValueError(f"PFM image must be HxW, HxWx1 or HxWx3, got {image.shape}")

    flipped = np.ascontiguousarray(np.flipud(image))

    byteorder = flipped.dtype.byteorder
    little = byteorder == "<" or (byteorder == "=" and sys.byteorder == "little")

    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode("utf-8"))
        f.write(f"{-scale if little else scale:f}\n".encode("utf-8"))
        flipped.tofile(f)
