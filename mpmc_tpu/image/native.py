"""Python wrapper over the C++ image decoder (libjpeg/libpng + resize)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from mpmc_tpu import native_lib


def available() -> bool:
    return native_lib.load() is not None


def decode_resize(path: str, size: int, grayscale: bool = False
                  ) -> Optional[np.ndarray]:
    """Decode + resize → uint8 [size, size, C]; None if undecodable."""
    lib = native_lib.load()
    if lib is None:
        return None
    c = 1 if grayscale else 3
    out = np.empty((size, size, c), dtype=np.uint8)
    ok = lib.img_decode_resize(
        path.encode(), size, int(grayscale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if ok else None
